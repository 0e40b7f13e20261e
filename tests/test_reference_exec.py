"""Parity against the EXECUTED reference, not hand-written replicas.

BASELINE.json's north star requires outputs within 1e-2 of the PyTorch
reference on fixed-seed inputs. Round 1 proved parity against torch
replicas built from the survey; these tests close the loop (VERDICT r1
"next" #1) by running the reference's own code at test time:

* ``FCT.py`` / ``AutoEncoder.py`` / ``UNet.py`` — AST-filtered exec of the
  actual sources (run-on-import tails and dead ``dataset``/``metric``
  imports dropped): tests/reference_exec/ref_loader.py.
* ``AE_32K`` / ``AE_256_32K`` / ``AE_64_4k`` / ``TransformerEncoder`` —
  the original 3.8 bytecode from ``/root/reference/__pycache__`` executed
  by a purpose-built CPython 3.8 interpreter
  (tests/reference_exec/py38_vm.py), since Python 3.12 cannot run 3.8
  code objects.

Weights transfer flax -> executed-original; outputs must agree in eval
mode to ~fp32 tolerance (much tighter than the 1e-2 requirement, which is
asserted as well).

Findings these tests surfaced that the replicas could not (each fixed in
the flax models once discovered):
* the recovered TransformerEncoder SHARES one LayerNorm per layer across
  both residual sites, and applies it to the BRANCH before the add
  (``x = skip + LN(branch(x))``), not to the sum — the survey (and round
  1's replica) misread this as standard post-norm;
* the original Encoder_32K ReLUs the FINAL squeeze stage too — the latent
  is non-negative (round 1 left the last stage linear);
* the original AE_32K squeeze/decoder convs carry biases that are
  mathematically redundant under the BatchNorm that follows (our TPU
  build omits them; porting an original checkpoint folds them into the BN
  running mean — ``zero_missing_bias`` below);
* AE_64_4k's encoder squeezes through FOUR stages (512->128->64->32->16;
  round 1 recovered three) and its decoder conv chain opens at 32 from
  the 16-channel latent.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "reference_exec"))

from ref_loader import load_pyc_classes, load_source_classes  # noqa: E402

KEY = jax.random.PRNGKey(0)
NORTH_STAR_ATOL = 1e-2  # BASELINE.json requirement
TIGHT_ATOL = 5e-4  # what we actually achieve (fp32 reassociation noise)


def _np(x):
    return np.asarray(x)


def _t(x):
    return torch.tensor(np.asarray(x))


def _conv_w(k):  # flax HWIO -> torch OIHW
    return _t(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())


def _upconv_w(k):  # flax (kh,kw,in,out) flipped -> torch (in,out,kh,kw)
    return _t(np.transpose(np.asarray(k)[::-1, ::-1], (2, 3, 0, 1)).copy())


def _copy_conv(t, p, zero_missing_bias=False):
    t.weight.copy_(_conv_w(p["kernel"]))
    if "bias" in p:
        t.bias.copy_(_t(p["bias"]))
    elif t.bias is not None and zero_missing_bias:
        # The original carries a conv bias that the flax build omits as
        # BN-redundant; zero = identical function.
        t.bias.zero_()


def _copy_ln(t, p):
    t.weight.copy_(_t(p["scale"]))
    t.bias.copy_(_t(p["bias"]))


def _copy_bn(t, p, s):
    t.weight.copy_(_t(p["BatchNorm_0"]["scale"]))
    t.bias.copy_(_t(p["BatchNorm_0"]["bias"]))
    t.running_mean.copy_(_t(s["BatchNorm_0"]["mean"]))
    t.running_var.copy_(_t(s["BatchNorm_0"]["var"]))


def _copy_linear(t, p):
    t.weight.copy_(_t(np.asarray(p["kernel"]).T.copy()))
    t.bias.copy_(_t(p["bias"]))


def _randomize_batch_stats(variables, seed=7):
    """Give BN running stats non-default values so the transfer is
    actually exercised (defaults are identical on both sides)."""
    rng = np.random.default_rng(seed)

    def rand(path, leaf):
        leaf = np.asarray(leaf)
        if path[-1] == "mean":
            return jnp.asarray(rng.normal(0, 0.2, leaf.shape).astype(leaf.dtype))
        return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape).astype(leaf.dtype))

    flat = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]
    stats = jax.tree_util.tree_map_with_path(
        lambda kp, x: rand([getattr(k, "key", str(k)) for k in kp], x),
        variables["batch_stats"],
    )
    del flat
    return dict(variables, batch_stats=stats)


def _copy_fct_transformer(t, params):
    """flax SpatialTransformer -> the reference Transformer
    (FCT.py:84-102): conv/LN projections, nn.MultiheadAttention packed
    qkv, conv1, post-LN, Wide_Focus."""
    ap = params["attention_output"]
    att = t.attention_output
    for n in ("q", "k", "v"):
        _copy_conv(getattr(att, f"conv_{n}"), ap[f"conv_{n}"])
        _copy_ln(getattr(att, f"layernorm_{n}"), ap[f"layernorm_{n}"])
    mha = ap["attention"]
    w_in = np.concatenate(
        [np.asarray(mha[f"{n}_proj"]["kernel"]).T for n in ("q", "k", "v")]
    )
    b_in = np.concatenate(
        [np.asarray(mha[f"{n}_proj"]["bias"]) for n in ("q", "k", "v")]
    )
    att.attention.in_proj_weight.copy_(_t(w_in))
    att.attention.in_proj_bias.copy_(_t(b_in))
    att.attention.out_proj.weight.copy_(
        _t(np.asarray(mha["out_proj"]["kernel"]).T.copy())
    )
    att.attention.out_proj.bias.copy_(_t(mha["out_proj"]["bias"]))
    _copy_conv(t.conv1, params["conv1"])
    _copy_ln(t.layernorm, params["layernorm"])
    for i in (1, 2, 3, 4):
        _copy_conv(getattr(t.wide_focus, f"conv{i}"), params["wide_focus"][f"conv{i}"])


def _assert_close(got, want, what):
    np.testing.assert_allclose(got, want, atol=NORTH_STAR_ATOL,
                               err_msg=f"{what}: outside the 1e-2 north star")
    np.testing.assert_allclose(got, want, atol=TIGHT_ATOL,
                               err_msg=f"{what}: outside fp32 tolerance")


def test_fct_matches_executed_reference():
    """Whole FCT vs the exec'd original (FCT.py:24-254), weights
    transferred, eval mode, fixed seed."""
    from tchvp_tpu.config import FCTConfig
    from tchvp_tpu.models import FCT

    ref = load_source_classes(
        "FCT",
        ["Attention", "Transformer", "Wide_Focus",
         "Block_encoder_bottleneck", "Block_decoder", "DS_out", "FCT"],
    )
    t = ref["FCT"]().eval()

    m = FCT(config=FCTConfig(attn_impl="xla"))
    x_np = np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    params = variables["params"]

    with torch.no_grad():
        for i in range(1, 10):
            tb = getattr(t, f"block_{i}")
            bp = params[f"block_{i}"]
            if i <= 5:  # encoder blocks
                if i in (1, 5):
                    _copy_conv(tb.conv1_a, bp["conv1_a"])
                else:
                    _copy_conv(tb.conv1_b, bp["conv1_b"])
                    _copy_conv(tb.conv3, bp["conv3"])
                _copy_conv(tb.conv2, bp["conv2"])
            else:  # decoder blocks
                for n in ("conv1", "conv2", "conv3"):
                    _copy_conv(getattr(tb, n), bp[n])
            _copy_fct_transformer(tb.trans, bp["trans"])
        for n in ("conv1", "conv2", "conv3"):
            _copy_conv(getattr(t.ds, n), params["ds"][n])

    want = t(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    got = m.apply(variables, jnp.asarray(x_np), deterministic=True)
    _assert_close(_np(got).transpose(0, 3, 1, 2), want.detach().numpy(), "FCT")


def test_autoencoder_matches_executed_reference():
    """AutoEncoder (AutoEncoder.py:5-134) exec'd original vs flax."""
    from tchvp_tpu.models import AutoEncoder

    ref = load_source_classes(
        "AutoEncoder",
        ["EncoderBlock", "DecoderBlock", "DeepSupervisionBlock",
         "Encoder", "Decoder", "AutoEncoder"],
    )
    t = ref["AutoEncoder"]().eval()

    m = AutoEncoder()
    x_np = np.random.default_rng(1).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    params = variables["params"]

    with torch.no_grad():
        for i in range(1, 6):
            tb = getattr(t.encoder, f"block_{i}")
            bp = params["encoder"][f"block_{i}"]
            for n in ("conv1_a", "conv1_b", "conv2", "conv3"):
                if n in bp:
                    _copy_conv(getattr(tb, n), bp[n])
        for i in range(1, 5):
            tb = getattr(t.decoder, f"block_{i}")
            bp = params["decoder"][f"block_{i}"]
            for n in ("conv1", "conv2", "conv3"):
                _copy_conv(getattr(tb, n), bp[n])
        for n in ("conv1", "conv2", "conv3"):
            _copy_conv(getattr(t.decoder.ds, n), params["decoder"]["ds"][n])

    lat_t, rec_t = t(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    lat_j, rec_j = m.apply(variables, jnp.asarray(x_np))
    _assert_close(_np(lat_j).transpose(0, 3, 1, 2), lat_t.detach().numpy(),
                  "AutoEncoder latent")
    _assert_close(_np(rec_j).transpose(0, 3, 1, 2), rec_t.detach().numpy(),
                  "AutoEncoder recon")


@pytest.mark.parametrize("origin", ["source", "pyc"])
def test_unet_matches_executed_reference(origin):
    """UNet exec'd original vs flax, randomized BN stats — both the
    ``UNet.py:6-66`` source AND its orphaned duplicate
    ``segmentationUNet`` bytecode (survey §0.2) run in the 3.8 VM."""
    from tchvp_tpu.config import UNetConfig
    from tchvp_tpu.models import UNet

    f = 8
    if origin == "source":
        ref = load_source_classes("UNet", ["UNet"])
    else:
        ref = load_pyc_classes("segmentationUNet", ["UNet"])
    t = ref["UNet"](in_channels=3, out_channels=1, init_features=f).eval()

    m = UNet(config=UNetConfig(init_features=f))
    x_np = np.random.default_rng(2).uniform(size=(1, 32, 32, 3)).astype(np.float32)
    variables = _randomize_batch_stats(m.init(KEY, jnp.asarray(x_np)))
    params, stats = variables["params"], variables["batch_stats"]

    def copy_block(tmod, fname):
        convs = [c for c in tmod.modules() if isinstance(c, torch.nn.Conv2d)]
        bns = [b for b in tmod.modules() if isinstance(b, torch.nn.BatchNorm2d)]
        for i, (c, b) in enumerate(zip(convs, bns), start=1):
            c.weight.copy_(_conv_w(params[fname][f"conv{i}"]["kernel"]))
            _copy_bn(b, params[fname][f"norm{i}"], stats[fname][f"norm{i}"])

    with torch.no_grad():
        for fname, tmod in (
            ("encoder1", t.encoder1), ("encoder2", t.encoder2),
            ("encoder3", t.encoder3), ("encoder4", t.encoder4),
            ("bottleneck", t.bottleneck),
            ("decoder4", t.decoder4), ("decoder3", t.decoder3),
            ("decoder2", t.decoder2), ("decoder1", t.decoder1),
        ):
            copy_block(tmod, fname)
        for fname, tmod in (
            ("upconv4", t.upconv4), ("upconv3", t.upconv3),
            ("upconv2", t.upconv2), ("upconv1", t.upconv1),
        ):
            tmod.weight.copy_(_upconv_w(params[fname]["kernel"]))
            tmod.bias.copy_(_t(params[fname]["bias"]))
        t.conv.weight.copy_(_conv_w(params["conv"]["kernel"]))
        t.conv.bias.copy_(_t(params["conv"]["bias"]))

    want = t(torch.tensor(x_np.transpose(0, 3, 1, 2)))
    got = m.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_np)
    )
    _assert_close(_np(got).transpose(0, 3, 1, 2), want.detach().numpy(), "UNet")


def _transfer_autoencoder32k(t, params, stats):
    """flax Autoencoder32K -> the VM-executed original (AE_32K pyc)."""
    enc, dec = params["encoder"], params["decoder"]
    senc, sdec = stats["encoder"], stats["decoder"]
    with torch.no_grad():
        t.encoder.conv1.weight.copy_(_conv_w(enc["stem_conv"]["kernel"]))
        _copy_bn(t.encoder.bn1, enc["stem_bn"], senc["stem_bn"])
        for li, layer in ((1, t.encoder.layer1), (2, t.encoder.layer2)):
            for j, blk in enumerate(layer):
                bp = enc[f"layer{li}_block{j}"]
                bs = senc[f"layer{li}_block{j}"]
                for n in ("conv1", "conv2", "conv3"):
                    _copy_conv(getattr(blk, n), bp[n])
                for n in ("bn1", "bn2", "bn3"):
                    _copy_bn(getattr(blk, n), bp[n], bs[n])
                if blk.downsample is not None:
                    _copy_conv(blk.downsample[0], bp["downsample_conv"])
                    _copy_bn(blk.downsample[1], bp["downsample_bn"],
                             bs["downsample_bn"])
        for i in range(4):  # squeeze chain: original convs carry biases
            tc = getattr(t.encoder, f"conv{i + 2}")
            _copy_conv(tc, enc[f"squeeze{i}_conv"], zero_missing_bias=True)
            _copy_bn(getattr(t.encoder, f"bn{i + 2}"),
                     enc[f"squeeze{i}_bn"], senc[f"squeeze{i}_bn"])
        for i in range(4):
            _copy_conv(getattr(t.decoder, f"conv{i + 1}"), dec[f"conv{i}"],
                       zero_missing_bias=True)
            _copy_bn(getattr(t.decoder, f"bn{i + 1}"), dec[f"bn{i}"],
                     sdec[f"bn{i}"])
        for i, (tc, tb) in enumerate(
            ((t.decoder.transConv1, t.decoder.dbn2),
             (t.decoder.transConv2, t.decoder.dbn3))
        ):
            tc.weight.copy_(_upconv_w(dec[f"upconv{i}"]["kernel"]))
            tc.bias.copy_(_t(dec[f"upconv{i}"]["bias"]))
            _copy_bn(tb, dec[f"up_bn{i}"], sdec[f"up_bn{i}"])
        for i, (cn, bn) in enumerate((("conv5", "bn5"), ("conv6", "bn6"))):
            _copy_conv(getattr(t.decoder, cn), dec[f"post_conv{i}"],
                       zero_missing_bias=True)
            _copy_bn(getattr(t.decoder, bn), dec[f"post_bn{i}"],
                     sdec[f"post_bn{i}"])
        _copy_conv(t.decoder.outputDeterminerConv, dec["head_conv"])
        _copy_bn(t.decoder.outputDeterminerNorm, dec["head_bn"],
                 sdec["head_bn"])


@pytest.mark.parametrize("output_type", ["image", "mask"])
def test_autoencoder32k_matches_executed_pyc(output_type):
    """Autoencoder32K vs the ORIGINAL AE_32K bytecode executed in the 3.8
    VM — full (3, 4) stage config, both decoder heads, randomized BN
    running stats."""
    from tchvp_tpu.config import ResNetAEConfig
    from tchvp_tpu.models import Autoencoder32K

    cl = load_pyc_classes(
        "AE_32K", ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder32K"]
    )
    t = cl["Autoencoder32K"](output_type).eval()

    m = Autoencoder32K(
        config=ResNetAEConfig(layers=(3, 4), output_type=output_type)
    )
    x_np = np.random.default_rng(3).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    variables = _randomize_batch_stats(m.init(KEY, jnp.asarray(x_np)))
    _transfer_autoencoder32k(t, variables["params"], variables["batch_stats"])

    x_t = torch.tensor(x_np.transpose(0, 3, 1, 2))
    with torch.no_grad():
        want = t(x_t)  # original forward returns the reconstruction only
        want_lat = t.encoder(x_t)
    lat_j, rec_j = m.apply(variables, jnp.asarray(x_np))
    _assert_close(_np(lat_j).transpose(0, 3, 1, 2), want_lat.numpy(),
                  f"AE32K[{output_type}] latent")
    _assert_close(_np(rec_j).transpose(0, 3, 1, 2), want.numpy(),
                  f"AE32K[{output_type}] recon")


def test_transformer_encoder_matches_executed_pyc():
    """Flax TransformerEncoder vs the ORIGINAL TransformerEncoder bytecode
    (ReLU'd q/k/v, 1/sqrt(input_dim) scale, post-norm, x sqrt(0.5))."""
    from tchvp_tpu.config import TransformerConfig
    from tchvp_tpu.models import TransformerEncoder

    cl = load_pyc_classes(
        "TransformerEncoder", ["MultiheadAttention", "TransformerEncoder"]
    )
    d, hdim, heads, layers, b, s = 16, 24, 4, 2, 2, 6
    t = cl["TransformerEncoder"](
        input_dim=d, hidden_dim=hdim, num_layers=layers, num_heads=heads,
        dropout=0.0,
    ).eval()

    cfg = TransformerConfig(
        input_dim=d, hidden_dim=hdim, num_layers=layers, num_heads=heads,
        dropout_rate=0.0, relu_qkv=True, scale_out=True,
    )
    m = TransformerEncoder(config=cfg)
    x_np = np.random.default_rng(4).normal(size=(b, s, d)).astype(np.float32)
    variables = m.init(KEY, jnp.asarray(x_np))
    params = variables["params"]
    # Make the shared per-layer norm non-trivial so the structure
    # (one LN applied at both residual sites) is actually exercised.
    rng = np.random.default_rng(11)
    for layer in range(layers):
        params[f"norm_{layer}"] = {
            "scale": jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(0, 0.2, d).astype(np.float32)),
        }

    with torch.no_grad():
        for layer in range(layers):
            attn = params[f"attention_{layer}"]
            ta = t.attention_layers[layer]
            _copy_linear(ta.query_layer, attn["q_linear"])
            _copy_linear(ta.key_layer, attn["k_linear"])
            _copy_linear(ta.value_layer, attn["v_linear"])
            _copy_linear(ta.output_layer, attn["out_linear"])
            ff = t.feedforward_layers[layer]
            _copy_linear(ff[0], params[f"ffn1_{layer}"])
            _copy_linear(ff[2], params[f"ffn2_{layer}"])
            _copy_ln(t.layer_norm[layer], params[f"norm_{layer}"])

    with torch.no_grad():
        want = t(torch.tensor(x_np), None)
    got = m.apply({"params": params}, jnp.asarray(x_np), deterministic=True)
    _assert_close(_np(got), want.numpy(), "TransformerEncoder")


def test_video_pipeline_matches_executed_pyc():
    """The flagship VideoHybridNet vs the same composition built from the
    EXECUTED original pieces (survey §3.5): Encoder_32K per frame ->
    latent->token reshape (AE_256_32K L118-119) -> TransformerEncoder over
    the clip token sequence -> Decoder_32K per frame."""
    from tchvp_tpu.config import (
        ResNetAEConfig,
        TransformerConfig,
        VideoModelConfig,
    )
    from tchvp_tpu.models import VideoHybridNet

    size, tlen, b = 32, 3, 2
    tokens_per_frame = 8
    dim = (size // 4) ** 2  # latent hh*ww

    ae_cl = load_pyc_classes(
        "AE_32K", ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder32K"]
    )
    tr_cl = load_pyc_classes(
        "TransformerEncoder", ["MultiheadAttention", "TransformerEncoder"]
    )
    t_ae = ae_cl["Autoencoder32K"]("image").eval()
    t_tr = tr_cl["TransformerEncoder"](
        input_dim=dim, hidden_dim=32, num_layers=1, num_heads=4, dropout=0.0
    ).eval()

    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(layers=(3, 4), token_latent=True),
        temporal=TransformerConfig(
            input_dim=dim, hidden_dim=32, num_layers=1, num_heads=4,
            dropout_rate=0.0, relu_qkv=True, scale_out=True,
        ),
        use_posenc=False,  # reference behavior
    )
    m = VideoHybridNet(config=cfg)
    clip_np = (
        np.random.default_rng(5)
        .uniform(size=(b, tlen, size, size, 3))
        .astype(np.float32)
    )
    variables = _randomize_batch_stats(m.init(KEY, jnp.asarray(clip_np)))
    params = variables["params"]

    # Encoder/decoder weights ride the AE_32K mapping; temporal the
    # TransformerEncoder mapping.
    _transfer_autoencoder32k(
        t_ae,
        {"encoder": params["encoder"], "decoder": params["decoder"]},
        {"encoder": variables["batch_stats"]["encoder"],
         "decoder": variables["batch_stats"]["decoder"]},
    )
    tp = params["temporal"]
    with torch.no_grad():
        ta = t_tr.attention_layers[0]
        _copy_linear(ta.query_layer, tp["attention_0"]["q_linear"])
        _copy_linear(ta.key_layer, tp["attention_0"]["k_linear"])
        _copy_linear(ta.value_layer, tp["attention_0"]["v_linear"])
        _copy_linear(ta.output_layer, tp["attention_0"]["out_linear"])
        _copy_linear(t_tr.feedforward_layers[0][0], tp["ffn1_0"])
        _copy_linear(t_tr.feedforward_layers[0][2], tp["ffn2_0"])
        _copy_ln(t_tr.layer_norm[0], tp["norm_0"])

    # Executed-original composition.
    frames = torch.tensor(
        clip_np.reshape(b * tlen, size, size, 3).transpose(0, 3, 1, 2)
    )
    with torch.no_grad():
        lat = t_ae.encoder(frames)  # (B*T, 8, hh, ww)
        hh, ww = lat.shape[2], lat.shape[3]
        tokens = lat.reshape(b * tlen, tokens_per_frame, hh * ww)  # L118-119
        tokens = tokens.reshape(b, tlen * tokens_per_frame, hh * ww)
        mixed = t_tr(tokens, None)
        lat2 = mixed.reshape(b * tlen, tokens_per_frame, hh, ww)
        rec = t_ae.decoder(lat2)  # (B*T, 3, H, W)
        want = rec.reshape(b, tlen, 3, size, size).numpy()

    toks_j, rec_j = m.apply(variables, jnp.asarray(clip_np))
    got = _np(rec_j).transpose(0, 1, 4, 2, 3)
    _assert_close(got, want, "VideoHybridNet composed pipeline")


def test_metrics_match_executed_reference():
    """Dice / Jaccard / PSNR vs the reference's own executed code
    (Metrics.py:5-39 class defs; Model.py:30 psnr staticmethod-style).
    MixedLoss is excluded: its pytorch_msssim dependency does not exist
    in this environment (our MS-SSIM is validated against scipy in
    tests/test_msssim.py instead)."""
    from tchvp_tpu import losses

    ref = load_source_classes("Metrics", ["DiceLoss", "JaccardScore"])
    ref_pyc = load_pyc_classes("metric", ["DiceLoss", "JaccardScore"])
    model_cls = load_source_classes("Model", ["Model"])["Model"]

    rng = np.random.default_rng(9)
    # NCHW for the originals; NHWC for ours.
    pred = rng.uniform(size=(2, 1, 16, 16)).astype(np.float32)
    true = (rng.uniform(size=(2, 1, 16, 16)) > 0.5).astype(np.float32)

    want_dice = float(ref["DiceLoss"]()(torch.tensor(pred), torch.tensor(true)))
    got_dice = float(
        losses.dice_loss(
            jnp.asarray(pred.transpose(0, 2, 3, 1)),
            jnp.asarray(true.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got_dice, want_dice, atol=1e-6)

    want_iou = float(
        ref["JaccardScore"]()(torch.tensor(pred > 0.5), torch.tensor(true > 0))
    )
    got_iou = float(
        losses.jaccard_score(
            jnp.asarray((pred > 0.5).transpose(0, 2, 3, 1)),
            jnp.asarray((true > 0).transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(got_iou, want_iou, atol=1e-6)

    # The orphaned `metric` bytecode variant must agree too (executed in
    # the 3.8 VM — covers the last recovered metrics module).
    np.testing.assert_allclose(
        float(ref_pyc["DiceLoss"]()(torch.tensor(pred), torch.tensor(true))),
        want_dice, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(ref_pyc["JaccardScore"]()(torch.tensor(pred > 0.5),
                                        torch.tensor(true > 0))),
        want_iou, atol=1e-6,
    )

    # Model.psnr only touches torch/F, so the unbound method runs without
    # constructing the (dependency-laden) Model instance.
    want_psnr = float(
        model_cls.psnr(None, torch.tensor(pred), torch.tensor(true))
    )
    got_psnr = float(
        losses.psnr(jnp.asarray(pred), jnp.asarray(true))
    )
    np.testing.assert_allclose(got_psnr, want_psnr, rtol=1e-5)


@pytest.mark.parametrize("output_type", ["image", "mask"])
def test_autoencoder4k_matches_executed_pyc(output_type):
    """Autoencoder4K vs the ORIGINAL AE_64_4k bytecode in the 3.8 VM.

    Executing this module exposed two structural divergences in round
    1's recovery (both fixed): the encoder squeeze chain is
    512->128->64->32->16 (four stages), and the decoder conv chain opens
    at 32 from the 16-channel latent."""
    from tchvp_tpu.models import Autoencoder4K

    cl = load_pyc_classes(
        "AE_64_4k", ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder4K"]
    )
    t = cl["Autoencoder4K"](output_type).eval()

    m = Autoencoder4K(output_type=output_type)
    x_np = np.random.default_rng(6).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    variables = _randomize_batch_stats(m.init(KEY, jnp.asarray(x_np)))
    _transfer_autoencoder32k(t, variables["params"], variables["batch_stats"])

    # Contiguous NCHW: the original's latent `.view` (AE_64_4k L118)
    # rejects strided tensors; its DataLoader always fed contiguous ones.
    x_t = torch.tensor(np.ascontiguousarray(x_np.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        want = t(x_t)
        want_lat = t.encoder(x_t)  # flat (B, 4096), channel-first order
    lat_j, rec_j = m.apply(variables, jnp.asarray(x_np))
    _assert_close(_np(lat_j), want_lat.numpy(), f"AE4K[{output_type}] latent")
    _assert_close(_np(rec_j).transpose(0, 3, 1, 2), want.numpy(),
                  f"AE4K[{output_type}] recon")


def test_autoencoder32k_256_matches_executed_pyc():
    """The AE_256_32K variant (the flagship's frame AE): identical
    parameters to AE_32K but the encoder RETURNS the latent as
    (B, 8, 4096) tokens (hardcoded view, L118-119 — only valid at 256²).
    Our `token_latent=True` path must reproduce both the tokens and the
    reconstruction against the executed original."""
    from tchvp_tpu.config import ResNetAEConfig
    from tchvp_tpu.models import Autoencoder32K

    cl = load_pyc_classes(
        "AE_256_32K",
        ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder32K"],
    )
    t = cl["Autoencoder32K"]("image").eval()

    m = Autoencoder32K(
        config=ResNetAEConfig(layers=(3, 4), token_latent=True)
    )
    x_np = (
        np.random.default_rng(8).uniform(size=(1, 256, 256, 3)).astype(np.float32)
    )
    variables = _randomize_batch_stats(m.init(KEY, jnp.asarray(x_np)))
    _transfer_autoencoder32k(t, variables["params"], variables["batch_stats"])

    x_t = torch.tensor(np.ascontiguousarray(x_np.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        want = t(x_t)
        want_tokens = t.encoder(x_t)  # (B, 8, 4096)
    tokens_j, rec_j = m.apply(variables, jnp.asarray(x_np))
    _assert_close(_np(tokens_j), want_tokens.numpy(), "AE256_32K tokens")
    _assert_close(_np(rec_j).transpose(0, 3, 1, 2), want.numpy(),
                  "AE256_32K recon")


def test_csv_dataset_len_quirk_executed(tmp_path):
    """Execute the recovered ``dataset.pyc`` CSVDataset and pin its
    ``__len__ = N - N % batch`` quirk (survey §7.5: item count truncated
    to a batch multiple but still an ITEM count, so iterating "len"
    batches overruns). Our manifest layer deliberately fixes this with
    true drop-last batching — this test documents the divergence against
    the reference's own executed code."""
    import csv as _csv

    from py38_marshal import load_pyc
    from py38_vm import build_classes

    from tchvp_tpu.data.manifest import ImageDataset

    co = load_pyc(
        os.path.join("/root/reference", "__pycache__", "dataset.cpython-38.pyc")
    )
    g = {"csv": _csv, "DATA_SIZE": 1, "open": open, "list": list,
         "len": len, "torch": torch}
    cls = build_classes(co, ["CSVDataset"], g)["CSVDataset"]

    n, batch = 10, 4
    paths = []
    for i in range(n):
        p = tmp_path / f"img{i}.png"
        pytest.importorskip("PIL.Image").fromarray(
            np.zeros((4, 4, 3), np.uint8)
        ).save(p)
        paths.append(str(p))
    csv_path = tmp_path / "data.csv"
    csv_path.write_text("\n".join(paths) + "\n")

    ref_ds = cls(str(csv_path), batch, None)  # (csv_file, batch_size, transforms)
    assert len(ref_ds) == n - n % batch == 8  # the quirk: 8 "items"

    ours = ImageDataset(str(csv_path), batch_size=batch, image_size=4,
                        shuffle=False)
    assert len(ours) == n // batch == 2  # true drop-last batch count
    assert sum(1 for _ in ours) == 2
