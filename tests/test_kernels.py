"""Pallas kernel numerics vs the XLA einsum reference (interpret mode on
CPU; the same kernels compile for TPU).

Covers the full flash attention (forward, custom-VJP backward, padding
path) and the banded/windowed variant (vs sdpa_windowed, gradients,
degenerate single-window case == full attention).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.kernels import flash_attention
from tchvp_tpu.ops.attention import sdpa_windowed, sdpa_xla


def _qkv(b=2, h=2, s=48, dh=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(b, h, s, dh)).astype(np.float32)
    )
    return mk(), mk(), mk()


def test_flash_matches_xla_forward():
    q, k, v = _qkv()
    want = sdpa_xla(q, k, v)
    got = flash_attention.mha(q, k, v, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_handles_ragged_seq_len():
    """S not a multiple of the block: zero-pad + mask path."""
    q, k, v = _qkv(s=37)
    want = sdpa_xla(q, k, v)
    got = flash_attention.mha(q, k, v, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_backward_matches_xla():
    q, k, v = _qkv(s=32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention.mha(q, k, v, block_q=16, block_k=16) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-4, atol=1e-4)


def test_windowed_pallas_matches_xla_windowed():
    q, k, v = _qkv(s=64)
    w = 16
    want = sdpa_windowed(q, k, v, window_size=w)
    got = flash_attention.windowed_mha(q, k, v, window_size=w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_windowed_single_window_equals_full_attention():
    """S <= window: the band degenerates to full attention."""
    q, k, v = _qkv(s=24)
    want = sdpa_xla(q, k, v)
    got = flash_attention.windowed_mha(q, k, v, window_size=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_windowed_backward_matches_xla_windowed():
    q, k, v = _qkv(s=48, seed=3)
    w = 16

    def loss_pallas(q, k, v):
        return jnp.sum(
            flash_attention.windowed_mha(q, k, v, window_size=w) ** 2
        )

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_windowed(q, k, v, window_size=w) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_windowed_locality():
    """Changing a key outside the band must not change a query's output."""
    q, k, v = _qkv(s=64, seed=4)
    w = 16
    base = flash_attention.windowed_mha(q, k, v, window_size=w)
    # Perturb keys/values in window 0; queries in window 3 (attending to
    # windows 2 and 3 only) must be unchanged.
    k2 = k.at[:, :, :w].add(10.0)
    v2 = v.at[:, :, :w].add(10.0)
    out2 = flash_attention.windowed_mha(q, k2, v2, window_size=w)
    np.testing.assert_array_equal(
        np.asarray(base[:, :, 3 * w :]), np.asarray(out2[:, :, 3 * w :])
    )
    # ...while window 0/1 queries DO change.
    assert not np.allclose(np.asarray(base[:, :, :w]), np.asarray(out2[:, :, :w]))


def test_attention_op_dispatch_windowed_flash():
    """multi_head_attention(impl='flash', window_size>0) routes to the
    banded Pallas kernel and matches the XLA windowed path."""
    from tchvp_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 32, 32)).astype(np.float32))
    got = multi_head_attention(x, x, x, num_heads=4, impl="flash", window_size=8)
    want = multi_head_attention(x, x, x, num_heads=4, impl="windowed", window_size=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
