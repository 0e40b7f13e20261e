"""Beyond-reference augmentation suite (data/pipeline.py::
augment_geometric): per-sample rot90 / crop-resize / color jitter,
all OFF by default so the reference chain (augment_denoising,
Model.py:44-53) stays bit-exact."""

import jax
import jax.numpy as jnp
import numpy as np

from tchvp_tpu.config import AugmentConfig
from tchvp_tpu.data import pipeline


def _images(b=4, s=16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(size=(b, s, s, 3)), jnp.float32
    )


def test_augment_geometric_default_is_identity():
    x = _images()
    out = pipeline.augment_geometric(jax.random.PRNGKey(0), x, AugmentConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_random_rot90_rotates_per_sample():
    x = _images(b=8)
    out = pipeline.random_rot90(jax.random.PRNGKey(1), x, prob=1.0)
    # Every sample is one of the four exact rotations — and with 8
    # samples at prob 1, at least one is a genuine non-identity rotation.
    rots = [np.asarray(jnp.rot90(x, k, axes=(-3, -2))) for k in range(4)]
    matched, nontrivial = 0, 0
    for i in range(x.shape[0]):
        for k, r in enumerate(rots):
            if np.array_equal(np.asarray(out)[i], r[i]):
                matched += 1
                nontrivial += k != 0
                break
    assert matched == x.shape[0]
    assert nontrivial >= 1
    # prob=0: identity.
    same = pipeline.random_rot90(jax.random.PRNGKey(1), x, prob=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def test_random_crop_resize_shape_and_clip_consistency():
    # Clip: all frames of a sample identical -> the shared per-sample
    # crop must keep them identical after aug.
    frame = _images(b=3, s=16, seed=2)
    clip = jnp.stack([frame, frame], axis=1)  # (B, 2, H, W, C)
    out = pipeline.random_crop_resize(
        jax.random.PRNGKey(3), clip, prob=1.0, frac=0.75
    )
    assert out.shape == clip.shape
    np.testing.assert_array_equal(
        np.asarray(out)[:, 0], np.asarray(out)[:, 1]
    )
    assert not np.array_equal(np.asarray(out), np.asarray(clip))
    same = pipeline.random_crop_resize(
        jax.random.PRNGKey(3), clip, prob=0.0, frac=0.75
    )
    np.testing.assert_array_equal(np.asarray(same), np.asarray(clip))


def test_color_jitter_bounded_and_gated():
    x = _images(b=6, seed=4)
    out = pipeline.color_jitter(jax.random.PRNGKey(5), x, prob=1.0, strength=0.4)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0
    assert not np.array_equal(o, np.asarray(x))
    same = pipeline.color_jitter(jax.random.PRNGKey(5), x, prob=0.0, strength=0.4)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def test_video_train_step_with_augs_runs():
    """The augmented video step jits and trains (loss finite) with every
    new aug enabled; the default-config step is untouched reference math."""
    import optax

    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.train.state import create_train_state, make_optimizer
    from tchvp_tpu.train import steps as steps_lib

    size = 32
    model = VideoHybridNet(config=flagship_video_config(image_size=size))
    clip = jnp.zeros((2, 2, size, size, 3), jnp.float32)
    state = create_train_state(
        model, clip, make_optimizer(1e-4), jax.random.PRNGKey(0)
    )
    aug = AugmentConfig(rot90_prob=0.5, crop_prob=0.5, jitter_prob=0.5)
    step = steps_lib.make_video_train_step(size, loss="mse", aug=aug)
    batch = np.random.default_rng(0).integers(
        0, 255, (2, 2, size, size, 3), dtype=np.uint8
    )
    new_state, metrics = step(state, jnp.asarray(batch))
    assert np.isfinite(float(metrics["loss"]))
