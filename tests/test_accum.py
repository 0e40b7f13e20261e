"""Gradient accumulation (make_video_train_step accum_steps) tests.

The accum path must equal an independently hand-computed two-microbatch
accumulation EXACTLY (same preprocessing, noise key, carried BN stats,
averaged grads, one AdamW update) — this cross-checks the lax.scan
machinery (reshape order, carry threading, averaging) without trusting
the implementation it tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu import losses
from tchvp_tpu.config import ResNetAEConfig, TransformerConfig, VideoModelConfig
from tchvp_tpu.data import pipeline
from tchvp_tpu.models import VideoHybridNet
from tchvp_tpu.train import create_train_state
from tchvp_tpu.train.steps import make_video_train_step

IMAGE = 32
ACCUM = 2


def _model():
    # dropout 0 everywhere: the accum path draws one dropout key per
    # microbatch (documented deviation), so exactness needs it off.
    return VideoHybridNet(
        config=VideoModelConfig(
            encoder=ResNetAEConfig(token_latent=True, dropout_rate=0.0),
            temporal=TransformerConfig(
                input_dim=(IMAGE // 4) ** 2, hidden_dim=32, num_layers=1,
                num_heads=4, dropout_rate=0.0,
            ),
        )
    )


def _state(tx=None):
    # SGD(1.0) for the parity test: final params = init - avg_grad, so
    # comparing params compares the RAW averaged gradients. (Adam is the
    # wrong probe here: it normalizes every update to ~±lr, so elements
    # whose microbatch grads nearly cancel amplify fp reduction-order
    # noise into full sign flips — observed before switching.)
    import optax

    model = _model()
    clip0 = jnp.zeros((4, 2, IMAGE, IMAGE, 3), jnp.float32)
    return create_train_state(
        model, clip0, tx if tx is not None else optax.sgd(1.0),
        jax.random.PRNGKey(0),
    ), model


def test_accum_matches_manual_two_microbatch():
    batch = np.random.default_rng(0).integers(
        0, 255, (4, 2, IMAGE, IMAGE, 3), dtype=np.uint8
    )
    state, model = _state()
    step = make_video_train_step(IMAGE, loss="mse", accum_steps=ACCUM)
    new_state, metrics = step(state, jnp.asarray(batch))

    # ---- manual accumulation: an UNROLLED python loop over direct flax
    # calls, inside ONE jit. (Jitting matters: eager op-by-op execution
    # compiles each conv/BN backward separately, and XLA's different
    # fusion/reduction order there drifts up to ~1e-3 on deep-stack
    # grads — measured; same-jit comparison isolates the scan semantics
    # at ~1e-7.) ----
    ref_state, _ = _state()

    def manual(params, bstats, rng, raw):
        clean = pipeline.preprocess_clip(raw, IMAGE)
        # Mirror the step's split exactly: it draws a geometry key even
        # though default AugmentConfig applies no aug (identity).
        rng, k_geo, k_noise, k_drop = jax.random.split(rng, 4)
        del k_geo
        noisy = pipeline.gaussian_noise(k_noise, clean, 0.05)
        mb = clean.shape[0] // ACCUM
        ks = jax.random.split(k_drop, ACCUM)
        g_sum, loss_sum, mse_sum = None, 0.0, 0.0
        for i in range(ACCUM):
            x = noisy[i * mb:(i + 1) * mb]
            y = clean[i * mb:(i + 1) * mb]

            def loss_of(params, bstats=bstats, x=x, y=y, k=ks[i]):
                (tokens, recon), mut = model.apply(
                    {"params": params, "batch_stats": bstats}, x,
                    deterministic=False, rngs={"dropout": k}, train=True,
                    mutable=["batch_stats"],
                )
                return losses.mse(recon, y), (recon, mut["batch_stats"])

            (l, (recon, bstats)), g = jax.value_and_grad(
                loss_of, has_aux=True
            )(params)
            g_sum = g if g_sum is None else jax.tree.map(jnp.add, g_sum, g)
            loss_sum = loss_sum + l
            mse_sum = mse_sum + losses.mse(recon, y)
        grads = jax.tree.map(lambda g: g / ACCUM, g_sum)
        return grads, bstats, loss_sum / ACCUM, mse_sum / ACCUM

    grads, bstats, want_loss, want_mse = jax.jit(manual)(
        ref_state.params, ref_state.batch_stats, ref_state.rng,
        jnp.asarray(batch),
    )
    ref_state = ref_state.apply_gradients(grads=grads)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(want_loss), rtol=1e-6
    )
    want_psnr = 20.0 * np.log10(1.0 / np.sqrt(float(want_mse)))
    np.testing.assert_allclose(float(metrics["psnr"]), want_psnr, rtol=1e-5)
    # Under SGD(1.0) this compares the averaged gradients themselves.
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # Carried BN stats match the sequential per-microbatch updates.
    for a, b in zip(
        jax.tree.leaves(new_state.batch_stats), jax.tree.leaves(bstats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_accum_rejects_indivisible_batch():
    state, _ = _state()
    step = make_video_train_step(IMAGE, loss="mse", accum_steps=3)
    batch = jnp.zeros((4, 2, IMAGE, IMAGE, 3), jnp.uint8)
    try:
        step(state, batch)
    except ValueError as e:
        assert "not divisible" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError for batch 4 % accum 3")
