"""Golden-shape tests for every model family.

The reference's only recorded expected values are notebook output shapes
(survey §4.1): AE latent (1,512,4,4) / recon (1,3,256,256), UNet mask
(1,1,256,256), combined (4,512,4,4)/(4,3,256,256)/(4,1,256,256). Those are
pinned here at reduced spatial size (same downsampling ratios — 2^k scaling
is exact) to keep single-core CI fast; the 256^2 ratios are asserted
analytically.
"""

import jax
import jax.numpy as jnp
import pytest

from tchvp_tpu.config import (
    AutoEncoderConfig,
    FCTConfig,
    TransformerConfig,
    VideoModelConfig,
)
from tchvp_tpu.models import (
    FCT,
    AutoEncoder,
    Autoencoder4K,
    Autoencoder32K,
    Image2Image2Mask,
    TransformerEncoder,
    UNet,
    VideoHybridNet,
)

KEY = jax.random.PRNGKey(0)


def test_autoencoder_shapes():
    # Reference: 5 stages halve 2^5; latent channels = filters[-1] = 128
    # (AutoEncoder.py:76, smoke test at :138-143).
    x = jnp.ones((2, 64, 64, 3))
    m = AutoEncoder()
    latent, recon = m.init_with_output(KEY, x)[0]
    assert latent.shape == (2, 2, 2, 128)
    assert recon.shape == (2, 64, 64, 3)


def test_autoencoder_notebook_variant_shapes():
    # Notebook golden: latent (B, 512, 4, 4) at 256^2 == (B, H/64, W/64, 512).
    x = jnp.ones((1, 128, 128, 3))
    m = AutoEncoder(config=AutoEncoderConfig.notebook_variant())
    latent, recon = m.init_with_output(KEY, x)[0]
    assert latent.shape == (1, 2, 2, 512)
    assert recon.shape == (1, 128, 128, 3)


def test_unet_shapes():
    x = jnp.ones((1, 32, 32, 3))
    m = UNet()
    out = m.init_with_output(KEY, x)[0]
    assert out.shape == (1, 32, 32, 1)
    assert jnp.all((out >= 0) & (out <= 1))  # sigmoid head (UNet.py:51)


def test_fct_shapes():
    x = jnp.ones((1, 32, 32, 3))
    m = FCT()
    out = m.init_with_output(KEY, x)[0]
    assert out.shape == (1, 32, 32, 1)
    assert jnp.all((out >= 0) & (out <= 1))  # sigmoid DS head (FCT.py:205)


def test_fct_non_square_input():
    # The reference's sqrt(H*W) reshape (FCT.py:77) breaks non-square
    # inputs; the rebuild carries (H, W) explicitly (survey §7.4).
    x = jnp.ones((1, 32, 64, 3))
    out = FCT().init_with_output(KEY, x)[0]
    assert out.shape == (1, 32, 64, 1)


def test_fct_stochastic_depth():
    """drop-path (FCTConfig.stochastic_depth_rate) gates the transformer
    residual branches at train time only; rate is schedule-linspaced so
    block_1 is always kept (FCT.py:217-218)."""
    import numpy as np

    from tchvp_tpu.config import FCTConfig

    x = jnp.ones((2, 32, 32, 3))
    base = FCT()
    sd = FCT(config=FCTConfig(stochastic_depth_rate=0.8))
    params = base.init(KEY, x)  # no extra params for drop-path
    # Eval: stochastic depth is a no-op — identical to the rate-0 model.
    np.testing.assert_array_equal(
        np.asarray(base.apply(params, x)), np.asarray(sd.apply(params, x))
    )
    # Train: different dropout keys give different outputs.
    o1 = sd.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = sd.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_combined_shapes():
    # Notebook golden (cell 8): (4,512,4,4)/(4,3,256,256)/(4,1,256,256)
    # at 256^2 with notebook filters; ratio-checked at 64^2 with defaults.
    x = jnp.ones((4, 64, 64, 3))
    m = Image2Image2Mask()
    latent, recon, mask = m.init_with_output(KEY, x)[0]
    assert latent.shape == (4, 2, 2, 128)
    assert recon.shape == (4, 64, 64, 3)
    assert mask.shape == (4, 64, 64, 1)


def test_autoencoder32k_shapes():
    # 32K latent: (B, H/4, W/4, 8); 8*64*64 = 32768 at 256^2 (AE_32K L104-115).
    x = jnp.ones((1, 64, 64, 3))
    latent, recon = Autoencoder32K().init_with_output(KEY, x)[0]
    assert latent.shape == (1, 16, 16, 8)
    assert recon.shape == (1, 64, 64, 3)
    assert jnp.all(recon >= 0)  # image head ends in ReLU (AE_32K L151-154)


def test_autoencoder32k_mask_head():
    from tchvp_tpu.config import ResNetAEConfig

    x = jnp.ones((1, 64, 64, 3))
    m = Autoencoder32K(config=ResNetAEConfig(output_type="mask"))
    latent, mask = m.init_with_output(KEY, x)[0]
    assert mask.shape == (1, 64, 64, 1)
    assert jnp.all((mask >= 0) & (mask <= 1))  # sigmoid head (AE_32K L155-158)


def test_autoencoder32k_token_latent():
    # AE_256_32K L118-119: (B, 8, 64, 64) -> (B, 8, 4096) token sequence.
    from tchvp_tpu.config import ResNetAEConfig

    x = jnp.ones((1, 64, 64, 3))
    m = Autoencoder32K(config=ResNetAEConfig(token_latent=True))
    tokens, recon = m.init_with_output(KEY, x)[0]
    assert tokens.shape == (1, 8, 256)
    assert recon.shape == (1, 64, 64, 3)


def test_autoencoder4k_flat_latent():
    # AE_64_4k L118: 64^2 input -> flat 4096-d latent.
    x = jnp.ones((1, 64, 64, 3))
    latent, recon = Autoencoder4K().init_with_output(KEY, x)[0]
    assert latent.shape == (1, 4096)
    assert recon.shape == (1, 64, 64, 3)


def test_transformer_encoder_shapes_and_mask():
    cfg = TransformerConfig(input_dim=64, hidden_dim=32, num_layers=2, num_heads=4)
    m = TransformerEncoder(config=cfg)
    x = jax.random.normal(KEY, (2, 8, 64))
    out, variables = m.init_with_output(KEY, x)
    assert out.shape == (2, 8, 64)
    # Mask changes the output (additive -1e9 semantics, L54-55).
    mask = jnp.ones((2, 8, 8)).at[:, :, 4:].set(0)
    out_masked = m.apply(variables, x, mask=mask)
    assert not jnp.allclose(out, out_masked)


def test_transformer_divisibility_check():
    cfg = TransformerConfig(input_dim=65, hidden_dim=32, num_layers=1, num_heads=4)
    m = TransformerEncoder(config=cfg)
    with pytest.raises(ValueError):
        m.init(KEY, jnp.ones((1, 4, 65)))


def test_video_hybrid_net_shapes():
    cfg = VideoModelConfig(
        temporal=TransformerConfig(input_dim=64, hidden_dim=32, num_layers=1, num_heads=4)
    )
    clip = jnp.ones((2, 4, 32, 32, 3))
    tokens, recon = VideoHybridNet(config=cfg).init_with_output(KEY, clip)[0]
    # 8 latent-channel tokens per frame x 4 frames; D = (32/4)^2 = 64.
    assert tokens.shape == (2, 32, 64)
    assert recon.shape == (2, 4, 32, 32, 3)


def test_downsample_ratios_match_reference_at_256():
    """Analytic check of the 256^2 golden shapes without paying 256^2 compute:
    encoder halvings are exact powers of two, so shapes scale linearly."""
    # AutoEncoder: 5 stages -> 256/32 = 8 -> latent (B, 8, 8, 128).
    assert 256 // 2 ** len(AutoEncoderConfig().filters) == 8
    # Notebook variant: 6 stages -> (B, 4, 4, 512) == ipynb cell 4 golden.
    assert 256 // 2 ** len(AutoEncoderConfig.notebook_variant().filters) == 4
    # Encoder32K: stem /2 + layer2 /2 -> 64x64x8 = 32768 ("32K", AE_32K L115).
    assert (256 // 4) ** 2 * 8 == 32768


def test_pixel_shuffle_upconv_equals_conv_transpose():
    """PixelShuffleUpconv must be a bit-level drop-in for
    nn.ConvTranspose((2,2), strides (2,2)): same param tree, same output
    (the polyphase identity — see ops/blocks.py)."""
    import flax.linen as nn
    import numpy as np

    from tchvp_tpu.ops.blocks import PixelShuffleUpconv

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 5, 7, 6)).astype(np.float32)
    )
    ref = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    vs = ref.init(jax.random.PRNGKey(0), x)
    ps = PixelShuffleUpconv(4)
    # Param trees interchange exactly.
    vs_ps = ps.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vs_ps) == jax.tree_util.tree_structure(vs)
    assert {k: v.shape for k, v in vs_ps["params"].items()} == {
        k: v.shape for k, v in vs["params"].items()
    }
    got = ps.apply(vs, x)
    want = ref.apply(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_conv_proj_attention_stride_and_proj_drop():
    """Reference constructor surface (FCT.py:25): stride_q/stride_kv
    express a strided-projection CvT variant (the reference's own forward
    can't run it — its view uses the input shape, FCT.py:69-77); output
    lands at q's spatial dims with fewer k/v tokens. proj_drop is real
    dropout (the reference stubs it, FCT.py:30,78): default 0.0 matches
    bit-for-bit, active rates perturb the train-mode output."""
    import numpy as np

    from tchvp_tpu.ops.conv_attention import ConvProjAttention

    c, heads = 8, 2
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, c)).astype(np.float32)
    )

    # Strided kv: q keeps 16x16, kv tokens shrink 4x; output at q dims.
    m = ConvProjAttention(channels=c, num_heads=heads, stride_kv=2)
    vs = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(vs, x).shape == (2, 16, 16, c)

    # Strided q: output spatial dims halve.
    mq = ConvProjAttention(channels=c, num_heads=heads, stride_q=2)
    vq = mq.init(jax.random.PRNGKey(0), x)
    assert mq.apply(vq, x).shape == (2, 8, 8, c)

    # proj_drop=0.0 (default) is exactly the previous computation; an
    # active rate changes train-mode output but not eval.
    base = ConvProjAttention(channels=c, num_heads=heads)
    vb = base.init(jax.random.PRNGKey(0), x)
    want = base.apply(vb, x)
    pd = ConvProjAttention(channels=c, num_heads=heads, proj_drop=0.3)
    np.testing.assert_array_equal(
        np.asarray(pd.apply(vb, x, deterministic=True)), np.asarray(want)
    )
    dropped = pd.apply(
        vb, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert not np.allclose(np.asarray(dropped), np.asarray(want))
