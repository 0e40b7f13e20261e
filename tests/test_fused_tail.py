"""Fused decoder-tail Pallas kernel vs the XLA reference chain and the
real Decoder32K.tail (eval mode, BN folded)."""

import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu.kernels.fused_tail import (
    fold_tail_params,
    fused_decoder_tail,
    fused_tail_reference,
)
from tchvp_tpu.models import Decoder32K


def _decoder_with_stats(output_type="image", seed=0, body_ch=384):
    """Init a Decoder32K and give it non-trivial batch stats so BN
    folding is actually exercised (fresh stats are 0/1)."""
    dec = Decoder32K(output_type=output_type)
    x = jnp.zeros((1, 8, 8, 8))
    variables = dec.init(jax.random.PRNGKey(seed), x)
    rng = np.random.default_rng(seed)
    stats = jax.tree.map(
        lambda v: jnp.asarray(
            rng.uniform(0.2, 1.5, v.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.normal(0, 0.3, v.shape).astype(np.float32)),
        variables["params"],
    )
    return dec, {"params": params, "batch_stats": stats}


def test_fold_matches_decoder_tail():
    """fused_tail_reference(folded) == Decoder32K.tail in eval mode."""
    dec, variables = _decoder_with_stats()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 8, 8, 384)).astype(np.float32)
    )
    want = dec.apply(variables, x, method=Decoder32K.tail)
    folded = fold_tail_params(variables["params"], variables["batch_stats"])
    got = fused_tail_reference(x, folded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fold_matches_decoder_tail_mask_head():
    dec, variables = _decoder_with_stats(output_type="mask", seed=3)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 8, 8, 384)).astype(np.float32)
    )
    want = dec.apply(variables, x, method=Decoder32K.tail)
    folded = fold_tail_params(variables["params"], variables["batch_stats"])
    got = fused_tail_reference(x, folded, output_type="mask")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def _random_folded(rng, cin=384, c1=192, c2=64, c3=8, c4=3):
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.2, s).astype(np.float32))  # noqa: E731
    b_up = mk(c1)
    return dict(
        w_up=mk(cin, 4 * c1), b_up=b_up, b_up4=jnp.tile(b_up, 4),
        w0=mk(3, 3, c1, c2), b0=mk(c2),
        w1=mk(3, 3, c2, c3), b1=mk(c3),
        w2=mk(3, 3, c3, c4), b2=mk(c4),
    )


def test_kernel_matches_reference_single_tile():
    """One tile covering the whole image (tile == 2H)."""
    rng = np.random.default_rng(4)
    # tile=16 -> th2=8, ein=12 (divisible by 6), input 8x8.
    folded = _random_folded(rng, cin=64, c1=32, c2=16, c3=8, c4=3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    want = fused_tail_reference(x, folded)
    got = fused_decoder_tail(x, folded, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kernel_matches_reference_multi_tile():
    """2x3 tile grid: exercises halos, border masking, tile seams."""
    rng = np.random.default_rng(5)
    folded = _random_folded(rng, cin=64, c1=32, c2=16, c3=8, c4=3)
    x = jnp.asarray(rng.normal(size=(1, 16, 24, 64)).astype(np.float32))
    want = fused_tail_reference(x, folded)
    got = fused_decoder_tail(x, folded, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kernel_mask_head_sigmoid():
    rng = np.random.default_rng(6)
    folded = _random_folded(rng, cin=64, c1=32, c2=16, c3=8, c4=1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    want = fused_tail_reference(x, folded, output_type="mask")
    got = fused_decoder_tail(x, folded, output_type="mask", tile=16,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kernel_full_pipeline_against_decoder():
    """Real Decoder32K weights end to end: body (XLA) + fused tail
    (Pallas) == full decoder __call__ in eval mode."""
    dec, variables = _decoder_with_stats(seed=7)
    lat = jnp.asarray(
        np.random.default_rng(8).normal(size=(1, 4, 4, 8)).astype(np.float32)
    )
    want = dec.apply(variables, lat)
    body = dec.apply(variables, lat, method=Decoder32K.body)  # (1,8,8,384)
    folded = fold_tail_params(variables["params"], variables["batch_stats"])
    got = fused_decoder_tail(body, folded, tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_fallback_on_untileable_shape():
    rng = np.random.default_rng(9)
    folded = _random_folded(rng, cin=64, c1=32, c2=16, c3=8, c4=3)
    x = jnp.asarray(rng.normal(size=(1, 9, 9, 64)).astype(np.float32))
    out = fused_decoder_tail(x, folded, tile=16, interpret=True)
    assert out.shape == (1, 18, 18, 3)
