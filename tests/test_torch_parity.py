"""Numerical parity against PyTorch on the exact ops the reference uses.

These tests copy weights between torch modules (the reference's building
blocks) and tchvp_tpu flax modules and assert output agreement, pinning
conv padding math, attention numerics, GELU flavor, and loss values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from tchvp_tpu.ops.attention import TorchMultiheadAttention

KEY = jax.random.PRNGKey(0)
torch.manual_seed(0)


def _np(x):
    return np.asarray(x)


def test_multihead_attention_matches_torch():
    """tchvp TorchMultiheadAttention == torch.nn.MultiheadAttention
    (the core of every FCT block, FCT.py:37,75)."""
    d, heads, b, s = 16, 2, 2, 12
    tmha = tnn.MultiheadAttention(embed_dim=d, num_heads=heads, bias=True, batch_first=True)
    q = torch.randn(b, s, d)
    k = torch.randn(b, s, d)
    v = torch.randn(b, s, d)
    with torch.no_grad():
        t_out, _ = tmha(q, k, v, need_weights=False)

    m = TorchMultiheadAttention(features=d, num_heads=heads)
    variables = m.init(KEY, jnp.ones((b, s, d)), jnp.ones((b, s, d)), jnp.ones((b, s, d)))

    w_in = tmha.in_proj_weight.detach().numpy()  # (3d, d)
    b_in = tmha.in_proj_bias.detach().numpy()
    params = {
        "q_proj": {"kernel": w_in[:d].T, "bias": b_in[:d]},
        "k_proj": {"kernel": w_in[d : 2 * d].T, "bias": b_in[d : 2 * d]},
        "v_proj": {"kernel": w_in[2 * d :].T, "bias": b_in[2 * d :]},
        "out_proj": {
            "kernel": tmha.out_proj.weight.detach().numpy().T,
            "bias": tmha.out_proj.bias.detach().numpy(),
        },
    }
    params = jax.tree.map(jnp.asarray, params)
    j_out = m.apply({"params": params}, jnp.asarray(_np(q)), jnp.asarray(_np(k)), jnp.asarray(_np(v)))
    np.testing.assert_allclose(_np(j_out), t_out.numpy(), atol=2e-5)


def test_depthwise_conv_same_matches_torch():
    """Depthwise 3x3 'same' conv == the reference q/k/v projections
    (FCT.py:31-35; conv_k/v's padding=1 equals 'same' for k3/s1)."""
    c, b, h, w = 8, 2, 10, 10
    tconv = tnn.Conv2d(c, c, 3, 1, padding="same", bias=True, groups=c)
    x = torch.randn(b, c, h, w)
    with torch.no_grad():
        t_out = tconv(x)

    import flax.linen as nn

    m = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c, use_bias=True)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = m.init(KEY, x_j)
    # torch weight (C_out, 1, kh, kw) -> flax HWIO (kh, kw, 1, C_out)
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}
    j_out = m.apply({"params": params}, x_j)
    np.testing.assert_allclose(
        _np(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=1e-5
    )


def test_dilated_conv_same_matches_torch():
    """Dilated 3x3 'same' convs == the Wide_Focus branches (FCT.py:110-112)."""
    cin, cout, b, h, w, dil = 4, 6, 1, 12, 12, 3
    tconv = tnn.Conv2d(cin, cout, 3, 1, padding="same", dilation=dil)
    x = torch.randn(b, cin, h, w)
    with torch.no_grad():
        t_out = tconv(x)

    import flax.linen as nn

    m = nn.Conv(cout, (3, 3), padding="SAME", kernel_dilation=(dil, dil))
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}
    j_out = m.apply({"params": params}, x_j)
    np.testing.assert_allclose(
        _np(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=1e-5
    )


def test_convtranspose_matches_torch():
    """ConvTranspose(k2,s2) == UNet upconvs (UNet.py:21-27) and the
    Decoder_32K upsamples (AE_32K L139-143)."""
    cin, cout = 4, 3
    tconv = tnn.ConvTranspose2d(cin, cout, kernel_size=2, stride=2)
    x = torch.randn(1, cin, 7, 7)
    with torch.no_grad():
        t_out = tconv(x)

    import flax.linen as nn

    m = nn.ConvTranspose(cout, (2, 2), strides=(2, 2))
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    # torch weight (C_in, C_out, kh, kw) -> flax (kh, kw, C_in, C_out),
    # spatially flipped: torch's transposed conv is the gradient of a conv
    # (implicit kernel flip); flax's is a fractionally-strided conv.
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}
    j_out = m.apply({"params": params}, x_j)
    assert j_out.shape == (1, 14, 14, cout)
    np.testing.assert_allclose(
        _np(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=1e-5
    )


def test_gelu_flavor_matches_torch():
    """torch nn.GELU default is exact erf — assert we match (FCT.py:114)."""
    x = torch.linspace(-3, 3, 101)
    with torch.no_grad():
        t_out = tnn.GELU()(x)
    j_out = jax.nn.gelu(jnp.asarray(x.numpy()), approximate=False)
    np.testing.assert_allclose(_np(j_out), t_out.numpy(), atol=1e-6)


def test_dice_loss_matches_reference_math():
    """Dice == reference Metrics.py:14-22 computed with torch."""
    from tchvp_tpu.losses import dice_loss

    pred = torch.rand(2, 3, 8, 8)
    true = torch.rand(2, 3, 8, 8)
    p = pred[:, 0].reshape(-1)
    t = true[:, 0].reshape(-1)
    inter = (p * t).sum()
    expected = 1.0 - (2 * inter + 1.0) / (p.sum() + t.sum() + 1.0)

    # NCHW -> NHWC for tchvp
    got = dice_loss(
        jnp.asarray(pred.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(true.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(float(got), float(expected), atol=1e-6)


def test_psnr_matches_reference_math():
    """PSNR == reference Model.py:30 computed with torch."""
    from tchvp_tpu.losses import psnr

    a = torch.rand(2, 3, 8, 8)
    b = torch.rand(2, 3, 8, 8)
    expected = 20 * torch.log10(1.0 / torch.sqrt(torch.nn.functional.mse_loss(a, b)))
    got = psnr(jnp.asarray(a.numpy()), jnp.asarray(b.numpy()))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_layernorm_matches_torch():
    """Channel-last LayerNorm eps 1e-5 == reference FCT.py:32-36 usage."""
    import flax.linen as nn

    c = 8
    tln = tnn.LayerNorm(c, eps=1e-5)
    with torch.no_grad():
        tln.weight.copy_(torch.randn(c))
        tln.bias.copy_(torch.randn(c))
    x = torch.randn(2, 5, 5, c)
    with torch.no_grad():
        t_out = tln(x)

    m = nn.LayerNorm(epsilon=1e-5)
    params = {
        "scale": jnp.asarray(tln.weight.detach().numpy()),
        "bias": jnp.asarray(tln.bias.detach().numpy()),
    }
    j_out = m.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(_np(j_out), t_out.numpy(), atol=1e-5)


def test_transformer_encoder_matches_torch_replica():
    """The recovered TransformerEncoder semantics (TransformerEncoder.py
    L6-126: ReLU'd q/k/v, 1/sqrt(input_dim) scaling, post-norm residuals,
    Linear-ReLU-Linear FFN, x sqrt(0.5) output scale) re-expressed with
    torch primitives must match the flax module in eval mode."""
    import math

    from tchvp_tpu.config import TransformerConfig
    from tchvp_tpu.models import TransformerEncoder

    d, hdim, heads, b, s = 16, 24, 4, 2, 6
    cfg = TransformerConfig(
        input_dim=d, hidden_dim=hdim, num_layers=2, num_heads=heads,
        dropout_rate=0.0, relu_qkv=True, scale_out=True,
    )
    m = TransformerEncoder(config=cfg)
    x_np = np.random.default_rng(0).normal(size=(b, s, d)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    params = variables["params"]

    x = torch.tensor(x_np)
    dh = d // heads
    for layer in range(cfg.num_layers):
        attn = params[f"attention_{layer}"]

        def lin(p, t):
            w = torch.tensor(np.asarray(p["kernel"]))  # (in, out)
            bb = torch.tensor(np.asarray(p["bias"]))
            return t @ w + bb

        q = torch.relu(lin(attn["q_linear"], x))
        k = torch.relu(lin(attn["k_linear"], x))
        v = torch.relu(lin(attn["v_linear"], x))
        # contiguous-chunk head split: (B, S, D) -> (B, H, S, Dh)
        qh = q.reshape(b, s, heads, dh).permute(0, 2, 1, 3)
        kh = k.reshape(b, s, heads, dh).permute(0, 2, 1, 3)
        vh = v.reshape(b, s, heads, dh).permute(0, 2, 1, 3)
        logits = qh @ kh.transpose(-1, -2) / math.sqrt(d)  # full-dim scale
        w = torch.softmax(logits, dim=-1)
        o = (w @ vh).permute(0, 2, 1, 3).reshape(b, s, d)
        attn_out = lin(attn["out_linear"], o)

        # x = skip + LN(branch): one shared LN per layer on both branch
        # outputs — the original's structure (test_reference_exec.py).
        ln = params[f"norm_{layer}"]

        def norm(v):
            return torch.nn.functional.layer_norm(
                v, (d,), torch.tensor(np.asarray(ln["scale"])),
                torch.tensor(np.asarray(ln["bias"])), eps=1e-5,
            )

        x = x + norm(attn_out)
        h = torch.relu(lin(params[f"ffn1_{layer}"], x))
        h = lin(params[f"ffn2_{layer}"], h)
        x = x + norm(h)
        x = x * math.sqrt(0.5)

    got = m.apply(variables, jnp.asarray(x_np), deterministic=True)
    np.testing.assert_allclose(_np(got), x.detach().numpy(), atol=2e-5)


def test_unet_full_model_matches_torch():
    """End-to-end UNet parity: the whole 4-down/4-up model (reference
    UNet.py:6-66) with weights transferred flax -> torch must agree in
    eval mode — covers skip-concat ordering, pooling, upconv plumbing."""
    from tchvp_tpu.models import UNet

    f = 8  # small init_features for test speed; structure identical
    from tchvp_tpu.config import UNetConfig

    m = UNet(config=UNetConfig(init_features=f))
    x_np = np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    params = variables["params"]

    class TBlock(tnn.Module):
        def __init__(self, cin, feat):
            super().__init__()
            self.c1 = tnn.Conv2d(cin, feat, 3, padding=1, bias=False)
            self.b1 = tnn.BatchNorm2d(feat)
            self.c2 = tnn.Conv2d(feat, feat, 3, padding=1, bias=False)
            self.b2 = tnn.BatchNorm2d(feat)

        def forward(self, x):
            x = torch.relu(self.b1(self.c1(x)))
            return torch.relu(self.b2(self.c2(x)))

    class TUNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.enc1 = TBlock(3, f)
            self.enc2 = TBlock(f, f * 2)
            self.enc3 = TBlock(f * 2, f * 4)
            self.enc4 = TBlock(f * 4, f * 8)
            self.bott = TBlock(f * 8, f * 16)
            self.up4 = tnn.ConvTranspose2d(f * 16, f * 8, 2, 2)
            self.dec4 = TBlock(f * 16, f * 8)
            self.up3 = tnn.ConvTranspose2d(f * 8, f * 4, 2, 2)
            self.dec3 = TBlock(f * 8, f * 4)
            self.up2 = tnn.ConvTranspose2d(f * 4, f * 2, 2, 2)
            self.dec2 = TBlock(f * 4, f * 2)
            self.up1 = tnn.ConvTranspose2d(f * 2, f, 2, 2)
            self.dec1 = TBlock(f * 2, f)
            self.head = tnn.Conv2d(f, 1, 1)

        def forward(self, x):
            e1 = self.enc1(x)
            e2 = self.enc2(torch.max_pool2d(e1, 2))
            e3 = self.enc3(torch.max_pool2d(e2, 2))
            e4 = self.enc4(torch.max_pool2d(e3, 2))
            b = self.bott(torch.max_pool2d(e4, 2))
            d4 = self.dec4(torch.cat([self.up4(b), e4], 1))
            d3 = self.dec3(torch.cat([self.up3(d4), e3], 1))
            d2 = self.dec2(torch.cat([self.up2(d3), e2], 1))
            d1 = self.dec1(torch.cat([self.up1(d2), e1], 1))
            return torch.sigmoid(self.head(d1))

    t = TUNet().eval()

    def conv_w(k):  # flax HWIO -> torch OIHW
        return torch.tensor(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())

    def upconv_w(k):  # flax (kh,kw,in,out), flipped -> torch (in,out,kh,kw)
        return torch.tensor(
            np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1)).copy()
        )

    with torch.no_grad():
        for fname, tmod in (
            ("encoder1", t.enc1), ("encoder2", t.enc2), ("encoder3", t.enc3),
            ("encoder4", t.enc4), ("bottleneck", t.bott),
            ("decoder4", t.dec4), ("decoder3", t.dec3), ("decoder2", t.dec2),
            ("decoder1", t.dec1),
        ):
            blk = params[fname]
            tmod.c1.weight.copy_(conv_w(blk["conv1"]["kernel"]))
            tmod.c2.weight.copy_(conv_w(blk["conv2"]["kernel"]))
        for fname, tmod in (
            ("upconv4", t.up4), ("upconv3", t.up3),
            ("upconv2", t.up2), ("upconv1", t.up1),
        ):
            tmod.weight.copy_(upconv_w(params[fname]["kernel"]))
            tmod.bias.copy_(torch.tensor(np.asarray(params[fname]["bias"])))
        t.head.weight.copy_(conv_w(params["conv"]["kernel"]))
        t.head.bias.copy_(torch.tensor(np.asarray(params["conv"]["bias"])))

    want = t(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    got = m.apply(variables, jnp.asarray(x_np))
    np.testing.assert_allclose(
        _np(got).transpose(0, 3, 1, 2), want.detach().numpy(), atol=3e-5
    )


def test_autoencoder32k_full_model_matches_torch():
    """End-to-end Autoencoder32K parity: ResNet-bottleneck encoder (stem,
    stages, squeeze chain) + Decoder32K (conv chain, ConvTranspose x2,
    image head) vs a torch replica of the recovered AE_32K architecture,
    weights transferred flax -> torch, eval mode."""
    from tchvp_tpu.config import ResNetAEConfig
    from tchvp_tpu.models import Autoencoder32K

    cfg = ResNetAEConfig(layers=(1, 1))  # one bottleneck per stage: fast,
    # same plumbing (stride-2 stage, downsample residual, squeeze chain)
    m = Autoencoder32K(config=cfg)
    x_np = np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    enc, dec = variables["params"]["encoder"], variables["params"]["decoder"]

    def conv_w(k):
        return torch.tensor(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())

    def upconv_w(k):
        return torch.tensor(
            np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1)).copy()
        )

    class TBottleneck(tnn.Module):
        def __init__(self, cin, planes, stride, downsample):
            super().__init__()
            self.c1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.b1 = tnn.BatchNorm2d(planes)
            self.c2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.b2 = tnn.BatchNorm2d(planes)
            self.c3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.b3 = tnn.BatchNorm2d(planes * 4)
            self.down = (
                tnn.Sequential(
                    tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )
                if downsample else None
            )

        def forward(self, x):
            idn = self.down(x) if self.down is not None else x
            y = torch.relu(self.b1(self.c1(x)))
            y = torch.relu(self.b2(self.c2(y)))
            return torch.relu(self.b3(self.c3(y)) + idn)

    class TModel(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.stem_bn = tnn.BatchNorm2d(64)
            self.l1 = TBottleneck(64, 64, 1, True)
            self.l2 = TBottleneck(256, 128, 2, True)
            sq_in, self.sq = 512, tnn.ModuleList()
            self.sq_bn = tnn.ModuleList()
            for f in (128, 64, 16, 8):
                self.sq.append(tnn.Conv2d(sq_in, f, 3, 1, 1, bias=False))
                self.sq_bn.append(tnn.BatchNorm2d(f))
                sq_in = f
            # decoder
            din, self.dc, self.dc_bn = 8, tnn.ModuleList(), tnn.ModuleList()
            for f in (16, 64, 128, 256):
                self.dc.append(tnn.Conv2d(din, f, 3, 1, 1, bias=False))
                self.dc_bn.append(tnn.BatchNorm2d(f))
                din = f
            self.up0 = tnn.ConvTranspose2d(256, 384, 2, 2)
            self.up0_bn = tnn.BatchNorm2d(384)
            self.up1 = tnn.ConvTranspose2d(384, 192, 2, 2)
            self.up1_bn = tnn.BatchNorm2d(192)
            self.p0 = tnn.Conv2d(192, 64, 3, 1, 1, bias=False)
            self.p0_bn = tnn.BatchNorm2d(64)
            self.p1 = tnn.Conv2d(64, 8, 3, 1, 1, bias=False)
            self.p1_bn = tnn.BatchNorm2d(8)
            self.head = tnn.Conv2d(8, 3, 3, 1, 1)
            self.head_bn = tnn.BatchNorm2d(3)

        def forward(self, x):
            h = torch.relu(self.stem_bn(self.stem(x)))
            h = self.l2(self.l1(h))
            for c, b in zip(self.sq, self.sq_bn):
                # ReLU on every squeeze stage incl. the latent — proven by
                # executing the AE_32K bytecode (test_reference_exec.py).
                h = torch.relu(b(c(h)))
            lat = h
            for c, b in zip(self.dc, self.dc_bn):
                h = torch.relu(b(c(h)))
            h = torch.relu(self.up0_bn(self.up0(h)))
            h = torch.relu(self.up1_bn(self.up1(h)))
            h = torch.relu(self.p0_bn(self.p0(h)))
            h = torch.relu(self.p1_bn(self.p1(h)))
            return lat, torch.relu(self.head_bn(self.head(h)))

    t = TModel().eval()

    with torch.no_grad():
        t.stem.weight.copy_(conv_w(enc["stem_conv"]["kernel"]))
        for blk_name, tb in (("layer1_block0", t.l1), ("layer2_block0", t.l2)):
            blk = enc[blk_name]
            tb.c1.weight.copy_(conv_w(blk["conv1"]["kernel"]))
            tb.c2.weight.copy_(conv_w(blk["conv2"]["kernel"]))
            tb.c3.weight.copy_(conv_w(blk["conv3"]["kernel"]))
            tb.down[0].weight.copy_(conv_w(blk["downsample_conv"]["kernel"]))
        for i in range(4):
            t.sq[i].weight.copy_(conv_w(enc[f"squeeze{i}_conv"]["kernel"]))
            t.dc[i].weight.copy_(conv_w(dec[f"conv{i}"]["kernel"]))
        for name, tm in (("upconv0", t.up0), ("upconv1", t.up1)):
            tm.weight.copy_(upconv_w(dec[name]["kernel"]))
            tm.bias.copy_(torch.tensor(np.asarray(dec[name]["bias"])))
        t.p0.weight.copy_(conv_w(dec["post_conv0"]["kernel"]))
        t.p1.weight.copy_(conv_w(dec["post_conv1"]["kernel"]))
        t.head.weight.copy_(conv_w(dec["head_conv"]["kernel"]))
        t.head.bias.copy_(torch.tensor(np.asarray(dec["head_conv"]["bias"])))

    lat_t, rec_t = t(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    lat_j, rec_j = m.apply(variables, jnp.asarray(x_np))
    np.testing.assert_allclose(
        _np(lat_j).transpose(0, 3, 1, 2), lat_t.detach().numpy(), atol=5e-5
    )
    np.testing.assert_allclose(
        _np(rec_j).transpose(0, 3, 1, 2), rec_t.detach().numpy(), atol=5e-5
    )


def test_spatial_transformer_block_matches_torch():
    """Full FCT transformer block (conv-projected attention -> conv ->
    residual -> LayerNorm -> Wide-Focus -> residual) vs a torch replica
    of the reference structure (FCT.py:24-132), weights transferred."""
    from tchvp_tpu.ops.conv_attention import SpatialTransformer

    c, heads, b, hw = 8, 2, 2, 8
    m = SpatialTransformer(channels=c, num_heads=heads)
    x_np = np.random.default_rng(0).normal(size=(b, hw, hw, c)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    params = variables["params"]

    class TAttention(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_q = tnn.Conv2d(c, c, 3, 1, "same", groups=c)
            self.ln_q = tnn.LayerNorm(c, eps=1e-5)
            self.conv_k = tnn.Conv2d(c, c, 3, 1, 1, groups=c)
            self.ln_k = tnn.LayerNorm(c, eps=1e-5)
            self.conv_v = tnn.Conv2d(c, c, 3, 1, 1, groups=c)
            self.ln_v = tnn.LayerNorm(c, eps=1e-5)
            self.attn = tnn.MultiheadAttention(c, heads, batch_first=True)

        def proj(self, x, conv, ln):
            y = torch.relu(conv(x)).permute(0, 2, 3, 1)
            return ln(y).permute(0, 3, 1, 2)

        def forward(self, x):
            q = self.proj(x, self.conv_q, self.ln_q)
            k = self.proj(x, self.conv_k, self.ln_k)
            v = self.proj(x, self.conv_v, self.ln_v)
            B, C, H, W = x.shape
            tok = lambda t: t.reshape(B, C, H * W).permute(0, 2, 1)  # noqa: E731
            o, _ = self.attn(tok(q), tok(k), tok(v), need_weights=False)
            return o.permute(0, 2, 1).reshape(B, C, H, W)

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.att = TAttention()
            self.conv1 = tnn.Conv2d(c, c, 3, 1, "same")
            self.ln = tnn.LayerNorm(c, eps=1e-5)
            self.wf = tnn.ModuleDict({
                f"conv{i}": tnn.Conv2d(c, c, 3, 1, "same", dilation=i)
                for i in (1, 2, 3)
            })
            self.wf4 = tnn.Conv2d(c, c, 3, 1, "same")

        def forward(self, x):
            x1 = self.conv1(self.att(x))
            x2 = x1 + x
            x3 = self.ln(x2.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            g = torch.nn.functional.gelu
            added = sum(g(self.wf[f"conv{i}"](x3)) for i in (1, 2, 3))
            return x2 + g(self.wf4(added))

    t = TBlock().eval()

    def conv_w(k):
        return torch.tensor(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())

    def dw_w(k):  # depthwise: flax (kh,kw,1,C) -> torch (C,1,kh,kw)
        return torch.tensor(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())

    ap = params["attention_output"]
    with torch.no_grad():
        for name, conv, ln in (
            ("q", t.att.conv_q, t.att.ln_q),
            ("k", t.att.conv_k, t.att.ln_k),
            ("v", t.att.conv_v, t.att.ln_v),
        ):
            conv.weight.copy_(dw_w(ap[f"conv_{name}"]["kernel"]))
            conv.bias.copy_(torch.tensor(np.asarray(ap[f"conv_{name}"]["bias"])))
            ln.weight.copy_(torch.tensor(np.asarray(ap[f"layernorm_{name}"]["scale"])))
            ln.bias.copy_(torch.tensor(np.asarray(ap[f"layernorm_{name}"]["bias"])))
        mha = ap["attention"]
        w_in = np.concatenate([
            np.asarray(mha["q_proj"]["kernel"]).T,
            np.asarray(mha["k_proj"]["kernel"]).T,
            np.asarray(mha["v_proj"]["kernel"]).T,
        ])
        b_in = np.concatenate([
            np.asarray(mha["q_proj"]["bias"]),
            np.asarray(mha["k_proj"]["bias"]),
            np.asarray(mha["v_proj"]["bias"]),
        ])
        t.att.attn.in_proj_weight.copy_(torch.tensor(w_in))
        t.att.attn.in_proj_bias.copy_(torch.tensor(b_in))
        t.att.attn.out_proj.weight.copy_(
            torch.tensor(np.asarray(mha["out_proj"]["kernel"]).T)
        )
        t.att.attn.out_proj.bias.copy_(
            torch.tensor(np.asarray(mha["out_proj"]["bias"]))
        )
        t.conv1.weight.copy_(conv_w(params["conv1"]["kernel"]))
        t.conv1.bias.copy_(torch.tensor(np.asarray(params["conv1"]["bias"])))
        t.ln.weight.copy_(torch.tensor(np.asarray(params["layernorm"]["scale"])))
        t.ln.bias.copy_(torch.tensor(np.asarray(params["layernorm"]["bias"])))
        wf = params["wide_focus"]
        for i in (1, 2, 3):
            t.wf[f"conv{i}"].weight.copy_(conv_w(wf[f"conv{i}"]["kernel"]))
            t.wf[f"conv{i}"].bias.copy_(
                torch.tensor(np.asarray(wf[f"conv{i}"]["bias"]))
            )
        t.wf4.weight.copy_(conv_w(wf["conv4"]["kernel"]))
        t.wf4.bias.copy_(torch.tensor(np.asarray(wf["conv4"]["bias"])))

    want = t(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    got = m.apply(variables, jnp.asarray(x_np), deterministic=True)
    np.testing.assert_allclose(
        _np(got).transpose(0, 3, 1, 2), want.detach().numpy(), atol=5e-5
    )


def _torch_fct_transformer(c, heads):
    """Torch replica of one FCT transformer block (reference FCT.py:84-102)."""

    class TAtt(tnn.Module):
        def __init__(self):
            super().__init__()
            for n in ("q", "k", "v"):
                setattr(self, f"conv_{n}", tnn.Conv2d(c, c, 3, 1, "same", groups=c))
                setattr(self, f"ln_{n}", tnn.LayerNorm(c, eps=1e-5))
            self.attn = tnn.MultiheadAttention(c, heads, batch_first=True)

        def forward(self, x):
            B, C, H, W = x.shape

            def proj(n):
                y = torch.relu(getattr(self, f"conv_{n}")(x)).permute(0, 2, 3, 1)
                y = getattr(self, f"ln_{n}")(y).permute(0, 3, 1, 2)
                return y.reshape(B, C, H * W).permute(0, 2, 1)

            o, _ = self.attn(proj("q"), proj("k"), proj("v"), need_weights=False)
            return o.permute(0, 2, 1).reshape(B, C, H, W)

    class TTrans(tnn.Module):
        def __init__(self):
            super().__init__()
            self.att = TAtt()
            self.conv1 = tnn.Conv2d(c, c, 3, 1, "same")
            self.ln = tnn.LayerNorm(c, eps=1e-5)
            self.wf = tnn.ModuleDict({
                f"conv{i}": tnn.Conv2d(c, c, 3, 1, "same", dilation=i)
                for i in (1, 2, 3)
            })
            self.wf4 = tnn.Conv2d(c, c, 3, 1, "same")

        def forward(self, x):
            x2 = self.conv1(self.att(x)) + x
            x3 = self.ln(x2.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            g = torch.nn.functional.gelu
            added = sum(g(self.wf[f"conv{i}"](x3)) for i in (1, 2, 3))
            return x2 + g(self.wf4(added))

    return TTrans()


def _conv_w(k):
    return torch.tensor(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())


def _copy_conv(t, p):
    t.weight.copy_(_conv_w(p["kernel"]))
    if "bias" in p:
        t.bias.copy_(torch.tensor(np.asarray(p["bias"])))


def _copy_ln(t, p):
    t.weight.copy_(torch.tensor(np.asarray(p["scale"])))
    t.bias.copy_(torch.tensor(np.asarray(p["bias"])))


def _copy_fct_transformer(t, params):
    ap = params["attention_output"]
    for n in ("q", "k", "v"):
        _copy_conv(getattr(t.att, f"conv_{n}"), ap[f"conv_{n}"])
        _copy_ln(getattr(t.att, f"ln_{n}"), ap[f"layernorm_{n}"])
    mha = ap["attention"]
    w_in = np.concatenate([np.asarray(mha[f"{n}_proj"]["kernel"]).T
                           for n in ("q", "k", "v")])
    b_in = np.concatenate([np.asarray(mha[f"{n}_proj"]["bias"])
                           for n in ("q", "k", "v")])
    t.att.attn.in_proj_weight.copy_(torch.tensor(w_in))
    t.att.attn.in_proj_bias.copy_(torch.tensor(b_in))
    t.att.attn.out_proj.weight.copy_(
        torch.tensor(np.asarray(mha["out_proj"]["kernel"]).T))
    t.att.attn.out_proj.bias.copy_(
        torch.tensor(np.asarray(mha["out_proj"]["bias"])))
    _copy_conv(t.conv1, params["conv1"])
    _copy_ln(t.ln, params["layernorm"])
    wf = params["wide_focus"]
    for i in (1, 2, 3):
        _copy_conv(t.wf[f"conv{i}"], wf[f"conv{i}"])
    _copy_conv(t.wf4, wf["conv4"])


def test_fct_full_model_matches_torch():
    """The whole 9-block FCT (multi-scale pyramid, encoder/decoder blocks,
    deep-supervision head) vs a torch replica of the reference composition
    (FCT.py:210-254), weights transferred, eval mode."""
    from tchvp_tpu.config import FCTConfig
    from tchvp_tpu.models import FCT

    f = [8, 16, 32, 64, 128, 64, 32, 16, 8]
    heads = 2
    m = FCT(config=FCTConfig(attn_impl="xla"))
    x_np = np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    params = variables["params"]

    class TEnc(tnn.Module):
        def __init__(self, blk, cin, cout):
            super().__init__()
            self.blk = blk
            if blk in ("first", "bottleneck"):
                self.conv1_a = tnn.Conv2d(cin, cout, 3, 1, "same")
            else:
                self.conv1_b = tnn.Conv2d(3, cin, 3, 1, "same")
                self.conv3 = tnn.Conv2d(cout, cout, 3, 1, "same")
            cin2 = cout if blk in ("first", "bottleneck") else cin * 2
            self.conv2 = tnn.Conv2d(cin2, cout, 3, 1, "same")
            self.trans = _torch_fct_transformer(cout, heads)

        def forward(self, x, scale_img=None):
            if self.blk in ("first", "bottleneck"):
                x1 = torch.relu(self.conv2(torch.relu(self.conv1_a(x))))
            else:
                skip = torch.relu(self.conv1_b(scale_img))
                x1 = torch.cat([skip, x], 1)
                x1 = torch.relu(self.conv2(x1))
                x1 = torch.relu(self.conv3(x1))
            return self.trans(torch.max_pool2d(x1, 2))

    class TDec(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, 1, "same")
            self.conv2 = tnn.Conv2d(cout * 2, cout, 3, 1, "same")
            self.conv3 = tnn.Conv2d(cout, cout, 3, 1, "same")
            self.trans = _torch_fct_transformer(cout, heads)

        def forward(self, x, skip):
            x1 = torch.nn.functional.interpolate(x, scale_factor=2)
            x1 = torch.relu(self.conv1(x1))
            x1 = torch.cat([skip, x1], 1)
            x1 = torch.relu(self.conv2(x1))
            x1 = torch.relu(self.conv3(x1))
            return self.trans(x1)

    class TFCT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.b1 = TEnc("first", 3, f[0])
            self.b2 = TEnc("second", f[0], f[1])
            self.b3 = TEnc("third", f[1], f[2])
            self.b4 = TEnc("fourth", f[2], f[3])
            self.b5 = TEnc("bottleneck", f[3], f[4])
            self.b6 = TDec(f[4], f[5])
            self.b7 = TDec(f[5], f[6])
            self.b8 = TDec(f[6], f[7])
            self.b9 = TDec(f[7], f[8])
            self.ds1 = tnn.Conv2d(f[8], f[8], 3, 1, "same")
            self.ds2 = tnn.Conv2d(f[8], f[8], 3, 1, "same")
            self.ds3 = tnn.Conv2d(f[8], 1, 3, 1, "same")

        def forward(self, x):
            ap = torch.nn.functional.avg_pool2d
            s2 = ap(x, 2)
            s3 = ap(s2, 2)
            s4 = ap(s3, 2)
            x1 = self.b1(x)
            x2 = self.b2(x1, s2)
            x3 = self.b3(x2, s3)
            x4 = self.b4(x3, s4)
            h = self.b5(x4)
            h = self.b6(h, x4)
            h = self.b7(h, x3)
            h = self.b8(h, x2)
            h = self.b9(h, x1)
            h = torch.nn.functional.interpolate(h, scale_factor=2)
            h = torch.relu(self.ds1(h))
            h = torch.relu(self.ds2(h))
            return torch.sigmoid(self.ds3(h))

    t = TFCT().eval()
    with torch.no_grad():
        for i, tb in enumerate((t.b1, t.b2, t.b3, t.b4, t.b5)):
            bp = params[f"block_{i + 1}"]
            if i in (0, 4):
                _copy_conv(tb.conv1_a, bp["conv1_a"])
            else:
                _copy_conv(tb.conv1_b, bp["conv1_b"])
                _copy_conv(tb.conv3, bp["conv3"])
            _copy_conv(tb.conv2, bp["conv2"])
            _copy_fct_transformer(tb.trans, bp["trans"])
        for i, tb in enumerate((t.b6, t.b7, t.b8, t.b9)):
            bp = params[f"block_{i + 6}"]
            for n in ("conv1", "conv2", "conv3"):
                _copy_conv(getattr(tb, n), bp[n])
            _copy_fct_transformer(tb.trans, bp["trans"])
        _copy_conv(t.ds1, params["ds"]["conv1"])
        _copy_conv(t.ds2, params["ds"]["conv2"])
        _copy_conv(t.ds3, params["ds"]["conv3"])

    want = t(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    got = m.apply(variables, jnp.asarray(x_np), deterministic=True)
    np.testing.assert_allclose(
        _np(got).transpose(0, 3, 1, 2), want.detach().numpy(), atol=1e-4
    )
