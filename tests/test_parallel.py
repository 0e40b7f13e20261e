"""Sharded-path tests on the 8-virtual-CPU-device mesh (survey §4 rebuild
strategy: exercise DP/multi-host logic without a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.parallel import (
    batch_spec,
    make_mesh,
    replicate,
    sequence_sharding,
    shard_batch,
)


def test_mesh_and_batch_sharding():
    mesh = make_mesh(("data",))
    assert mesh.devices.size == 8
    batch = np.ones((16, 8, 8, 3), np.float32)
    sharded = shard_batch(batch, mesh)
    assert sharded.sharding.spec == batch_spec(mesh, 4)
    # Each device holds 16/8 = 2 rows.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_2d_mesh_dp_sp():
    mesh = make_mesh(("data", "seq"), (4, 2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "seq": 2}
    x = np.ones((8, 16, 32), np.float32)
    s = jax.device_put(x, sequence_sharding(mesh, 3, seq_dim=1))
    shard_shapes = {sh.data.shape for sh in s.addressable_shards}
    assert shard_shapes == {(8, 8, 32)}


def test_data_parallel_grad_matches_single_device():
    """DP loss/grads under GSPMD == single-device computation."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    model = Tiny()
    x = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(16, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss_fn(p, x, y):
        return jnp.mean((model.apply({"params": p}, x) - y) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, x, y)

    mesh = make_mesh(("data",))
    p_repl = replicate(params, mesh)
    x_sh = shard_batch(x, mesh)
    y_sh = shard_batch(y, mesh)
    with mesh:
        dp_loss, dp_grads = jax.jit(jax.value_and_grad(loss_fn))(p_repl, x_sh, y_sh)
    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(dp_grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_dryrun_multichip_entrypoint():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None  # traces + lowers without error


def test_tensor_parallel_matches_unsharded():
    """tp_axis activation sharding must be numerics-neutral: the temporal
    transformer over a ("data", "model") mesh equals the unsharded run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tchvp_tpu.config import TransformerConfig
    from tchvp_tpu.models import TransformerEncoder
    from tchvp_tpu.parallel import make_mesh

    d, heads = 32, 4
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 6, d)).astype(np.float32)
    )
    base = TransformerEncoder(
        config=TransformerConfig(
            input_dim=d, hidden_dim=16, num_layers=2, num_heads=heads
        )
    )
    variables = base.init(jax.random.PRNGKey(0), x)
    want = base.apply(variables, x, deterministic=True)

    tp = TransformerEncoder(
        config=TransformerConfig(
            input_dim=d, hidden_dim=16, num_layers=2, num_heads=heads,
            tp_axis="model",
        )
    )
    mesh = make_mesh(("data", "model"), (4, 2))
    with mesh:
        got = jax.jit(lambda v, x: tp.apply(v, x, deterministic=True))(
            variables, x
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_seq_parallel_windowed_attention_matches_unsharded():
    """TRUE sequence parallelism (survey §5.7 decision): the banded
    windowed attention over seq-sharded tokens must equal the unsharded
    computation — forward AND gradients — and its compiled HLO must move
    only O(window) halo bytes by collective-permute, with no all-gather
    of the sequence (the cost GSPMD pays for FULL attention over
    seq-sharded tokens, measured below)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tchvp_tpu.ops.attention import sdpa_windowed, sdpa_windowed_seq_sharded

    mesh = make_mesh(("seq",))
    b, h, s, dh, w = 2, 4, 64, 8, 8
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
        for _ in range(3)
    )

    def loss_ref(q, k, v):
        return (sdpa_windowed(q, k, v, window_size=w) ** 2).sum()

    def loss_sh(q, k, v):
        return (
            sdpa_windowed_seq_sharded(q, k, v, window_size=w, seq_axis="seq")
            ** 2
        ).sum()

    want, wgrads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
    with mesh:
        fn = jax.jit(jax.value_and_grad(loss_sh, argnums=(0, 1, 2)))
        got, grads = fn(qs, ks, vs)
        hlo = fn.lower(qs, ks, vs).compile().as_text()

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for g, wg in zip(grads, wgrads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wg), atol=1e-4)

    assert "all-gather" not in hlo, "seq-parallel band must not gather the sequence"
    assert "collective-permute" in hlo, "halo exchange should be a ppermute"

    # The GSPMD alternative: FULL attention over the same seq-sharded
    # tokens all-gathers k/v — document the collective it inserts.
    from tchvp_tpu.ops.attention import sdpa_xla

    with mesh:
        full = jax.jit(lambda a, b_, c: sdpa_xla(a, b_, c))
        hlo_full = full.lower(qs, ks, vs).compile().as_text()
    assert "all-gather" in hlo_full or "all-to-all" in hlo_full


def test_transformer_seq_axis_end_to_end():
    """TransformerEncoder with seq_axis sharded over the mesh matches the
    unsharded model (same params, same inputs)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tchvp_tpu.config import TransformerConfig
    from tchvp_tpu.models import TransformerEncoder

    d, s, b, w = 16, 32, 2, 4
    base = dict(
        input_dim=d, hidden_dim=24, num_layers=2, num_heads=4,
        dropout_rate=0.0, window_size=w, attn_impl="windowed",
    )
    m_ref = TransformerEncoder(config=TransformerConfig(**base))
    m_sh = TransformerEncoder(config=TransformerConfig(**base, seq_axis="seq"))

    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(b, s, d)).astype(np.float32)
    )
    variables = m_ref.init(jax.random.PRNGKey(0), x)
    want = m_ref.apply(variables, x, deterministic=True)

    mesh = make_mesh(("data", "seq"), (2, 4))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
    with mesh:
        got = jax.jit(
            lambda v, t: m_sh.apply(v, t, deterministic=True)
        )(variables, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_seq_parallel_flash_matches_unsharded():
    """The Pallas halo-kernel route of the seq-parallel band (shard_map +
    ppermute + windowed_mha_halo) must match unsharded sdpa_windowed,
    forward and gradients, on the 8-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tchvp_tpu.ops.attention import sdpa_windowed, sdpa_windowed_seq_sharded

    mesh = make_mesh(("seq",))
    b, h, s, dh, w = 2, 4, 64, 8, 8
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, dh)).astype(np.float32))
        for _ in range(3)
    )

    def loss_ref(q, k, v):
        return (sdpa_windowed(q, k, v, window_size=w) ** 2).sum()

    def loss_fl(q, k, v):
        return (
            sdpa_windowed_seq_sharded(
                q, k, v, window_size=w, seq_axis="seq", use_flash=True
            )
            ** 2
        ).sum()

    want, wg = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
    with mesh:
        got, g = jax.jit(jax.value_and_grad(loss_fl, argnums=(0, 1, 2)))(
            qs, ks, vs
        )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for a, b_ in zip(g, wg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
