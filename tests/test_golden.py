"""Golden-output regression fixtures.

Fixed-seed CPU fp32 outputs of every model family, pinned to stored
values. Guards numerics across refactors (the reference's only "golden
values" are notebook shape printouts — survey §4.1; here actual tensor
values are pinned). Regenerate deliberately with:

    TCHVP_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = bool(os.environ.get("TCHVP_REGEN_GOLDEN"))


def _check(name: str, arrays: dict):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    stored = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            np.asarray(v), stored[k], rtol=1e-5, atol=1e-5,
            err_msg=f"{name}/{k} drifted from golden fixture",
        )


def _stats(x) -> dict:
    """Compact fingerprint: mean/std + a fixed probe of 32 values."""
    flat = jnp.ravel(x.astype(jnp.float32))
    idx = jnp.linspace(0, flat.shape[0] - 1, 32).astype(jnp.int32)
    return {"mean": jnp.mean(flat), "std": jnp.std(flat), "probe": flat[idx]}


def test_golden_autoencoder():
    from tchvp_tpu.models import AutoEncoder

    m = AutoEncoder()
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    latent, recon = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    _check("autoencoder", {**{f"l_{k}": v for k, v in _stats(latent).items()},
                           **{f"r_{k}": v for k, v in _stats(recon).items()}})


def test_golden_unet():
    from tchvp_tpu.models import UNet

    m = UNet()
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    _check("unet", _stats(y))


def test_golden_fct():
    from tchvp_tpu.config import FCTConfig
    from tchvp_tpu.models import FCT

    m = FCT(config=FCTConfig(attn_impl="xla"))
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    _check("fct", _stats(y))


def test_golden_resnet_ae():
    from tchvp_tpu.config import ResNetAEConfig
    from tchvp_tpu.models import Autoencoder32K

    m = Autoencoder32K(config=ResNetAEConfig(layers=(1, 1)))
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    latent, recon = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    _check("resnet_ae", {**{f"l_{k}": v for k, v in _stats(latent).items()},
                         **{f"r_{k}": v for k, v in _stats(recon).items()}})


def test_golden_transformer():
    from tchvp_tpu.config import TransformerConfig
    from tchvp_tpu.models import TransformerEncoder

    m = TransformerEncoder(
        config=TransformerConfig(input_dim=32, hidden_dim=24, num_layers=2,
                                 num_heads=4)
    )
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 6, 32))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x, deterministic=True)
    _check("transformer", _stats(y))


def test_golden_video_pipeline():
    from tchvp_tpu.config import ResNetAEConfig, TransformerConfig, VideoModelConfig
    from tchvp_tpu.models import VideoHybridNet

    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(layers=(1, 1), token_latent=True),
        temporal=TransformerConfig(input_dim=64, hidden_dim=16, num_layers=1,
                                   num_heads=4),
    )
    m = VideoHybridNet(config=cfg)
    clip = jax.random.uniform(jax.random.PRNGKey(7), (1, 4, 32, 32, 3))
    tokens, recon = m.apply(m.init(jax.random.PRNGKey(0), clip), clip)
    _check("video", {**{f"t_{k}": v for k, v in _stats(tokens).items()},
                     **{f"r_{k}": v for k, v in _stats(recon).items()}})
