"""Checkpoint migration (utils/torch_port): reference torch state_dicts
-> flax variables, pinned against the EXECUTED originals.

Each test builds the reference's own model (tests/reference_exec) with
random weights and randomized BN running stats, exports its state_dict,
imports it with torch_port, and asserts the flax model reproduces the
original's outputs — i.e. a real user checkpoint from the reference runs
here unchanged (survey §5.4: checkpoints are the transfer interface).
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

from tchvp_tpu.utils import torch_port  # noqa: E402

KEY = jax.random.PRNGKey(0)
ATOL = 5e-4


def _randomize_torch_bn(module, seed=5):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, buf in module.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.2)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


def _close(got, want, what):
    np.testing.assert_allclose(got, want, atol=ATOL, err_msg=what)


def test_import_unet():
    from tchvp_tpu.config import UNetConfig
    from tchvp_tpu.models import UNet

    t = load_source_classes("UNet", ["UNet"])["UNet"](3, 1, 8).eval()
    _randomize_torch_bn(t)
    variables = torch_port.import_unet(t.state_dict())

    x = np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32)
    want = t(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    got = UNet(config=UNetConfig(init_features=8)).apply(
        variables, jnp.asarray(x)
    )
    _close(np.asarray(got).transpose(0, 3, 1, 2), want, "UNet import")


def test_import_transformer_encoder():
    from tchvp_tpu.config import TransformerConfig
    from tchvp_tpu.models import TransformerEncoder

    d, layers = 16, 2
    cl = load_pyc_classes(
        "TransformerEncoder", ["MultiheadAttention", "TransformerEncoder"]
    )
    t = cl["TransformerEncoder"](d, 24, layers, 4, 0.0).eval()
    variables = torch_port.import_transformer_encoder(t.state_dict(), layers)

    x = np.random.default_rng(1).normal(size=(2, 6, d)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x), None).numpy()
    m = TransformerEncoder(config=TransformerConfig(
        input_dim=d, hidden_dim=24, num_layers=layers, num_heads=4,
        dropout_rate=0.0,
    ))
    got = m.apply(variables, jnp.asarray(x), deterministic=True)
    _close(np.asarray(got), want, "TransformerEncoder import")


@pytest.mark.parametrize("family", ["ae32k", "ae4k"])
def test_import_resnet_autoencoders(family):
    from tchvp_tpu.config import ResNetAEConfig
    from tchvp_tpu.models import Autoencoder4K, Autoencoder32K

    if family == "ae32k":
        cl = load_pyc_classes(
            "AE_32K", ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder32K"]
        )
        t = cl["Autoencoder32K"]("image").eval()
        m = Autoencoder32K(config=ResNetAEConfig(layers=(3, 4)))
    else:
        cl = load_pyc_classes(
            "AE_64_4k", ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder4K"]
        )
        t = cl["Autoencoder4K"]("image").eval()
        m = Autoencoder4K()
    _randomize_torch_bn(t)
    variables = (
        torch_port.import_autoencoder32k(t.state_dict())
        if family == "ae32k"
        else torch_port.import_autoencoder4k(t.state_dict())
    )

    x = np.random.default_rng(2).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    x_t = torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        want = t(x_t).numpy()
    _, rec = m.apply(variables, jnp.asarray(x))
    _close(np.asarray(rec).transpose(0, 3, 1, 2), want, f"{family} import")


def test_import_fct():
    from tchvp_tpu.config import FCTConfig
    from tchvp_tpu.models import FCT

    ref = load_source_classes(
        "FCT",
        ["Attention", "Transformer", "Wide_Focus",
         "Block_encoder_bottleneck", "Block_decoder", "DS_out", "FCT"],
    )
    t = ref["FCT"]().eval()
    variables = torch_port.import_fct(t.state_dict())

    x = np.random.default_rng(3).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    want = t(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    got = FCT(config=FCTConfig(attn_impl="xla")).apply(
        variables, jnp.asarray(x), deterministic=True
    )
    _close(np.asarray(got).transpose(0, 3, 1, 2), want, "FCT import")


def test_import_autoencoder_and_checkpoint_file(tmp_path):
    """AutoEncoder importer + the load_reference_checkpoint entry point
    on a real torch.save file in the reference's full-dict format."""
    from tchvp_tpu.models import AutoEncoder

    ref = load_source_classes(
        "AutoEncoder",
        ["EncoderBlock", "DecoderBlock", "DeepSupervisionBlock",
         "Encoder", "Decoder", "AutoEncoder"],
    )
    t = ref["AutoEncoder"]().eval()

    # The reference's .tar layout (FCT.py:368-373).
    path = str(tmp_path / "ckpt.tar")
    torch.save({"epoch": 3, "model_state_dict": t.state_dict(),
                "loss": 0.5}, path)
    sd = torch_port.load_reference_checkpoint(path)
    variables = torch_port.import_autoencoder(sd)

    x = np.random.default_rng(4).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        lat_t, rec_t = t(torch.tensor(x.transpose(0, 3, 1, 2)))
    lat, rec = AutoEncoder().apply(variables, jnp.asarray(x))
    _close(np.asarray(lat).transpose(0, 3, 1, 2), lat_t.numpy(), "AE latent")
    _close(np.asarray(rec).transpose(0, 3, 1, 2), rec_t.numpy(), "AE recon")


def test_import_video_hybrid():
    """Flagship composition: AE_256_32K frame AE + temporal transformer
    checkpoints -> VideoHybridNet variables (the reference's cross-stage
    checkpoint-transfer pattern, AE_32K L233-245)."""
    from tchvp_tpu.config import (
        ResNetAEConfig,
        TransformerConfig,
        VideoModelConfig,
    )
    from tchvp_tpu.models import VideoHybridNet

    size, tlen = 32, 2
    dim = (size // 4) ** 2
    ae_cl = load_pyc_classes(
        "AE_32K", ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder32K"]
    )
    tr_cl = load_pyc_classes(
        "TransformerEncoder", ["MultiheadAttention", "TransformerEncoder"]
    )
    t_ae = ae_cl["Autoencoder32K"]("image").eval()
    _randomize_torch_bn(t_ae)
    t_tr = tr_cl["TransformerEncoder"](dim, 32, 1, 4, 0.0).eval()

    variables = torch_port.import_video_hybrid(
        t_ae.state_dict(), t_tr.state_dict(), num_layers=1
    )
    cfg = VideoModelConfig(
        encoder=ResNetAEConfig(layers=(3, 4), token_latent=True),
        temporal=TransformerConfig(
            input_dim=dim, hidden_dim=32, num_layers=1, num_heads=4,
            dropout_rate=0.0,
        ),
        use_posenc=False,
    )
    m = VideoHybridNet(config=cfg)

    clip = (
        np.random.default_rng(5)
        .uniform(size=(1, tlen, size, size, 3))
        .astype(np.float32)
    )
    frames = torch.tensor(
        np.ascontiguousarray(
            clip.reshape(tlen, size, size, 3).transpose(0, 3, 1, 2)
        )
    )
    with torch.no_grad():
        lat = t_ae.encoder(frames)
        hh, ww = lat.shape[2], lat.shape[3]
        tokens = lat.reshape(tlen, 8, hh * ww).reshape(1, tlen * 8, hh * ww)
        mixed = t_tr(tokens, None)
        lat2 = mixed.reshape(tlen, 8, hh, ww)
        want = t_ae.decoder(lat2).reshape(1, tlen, 3, size, size).numpy()

    _, rec = m.apply(variables, jnp.asarray(clip))
    _close(np.asarray(rec).transpose(0, 1, 4, 2, 3), want, "VideoHybrid import")


def test_cli_port_roundtrip(tmp_path):
    """`tchvp port`: torch file -> orbax checkpoint -> restored flax
    variables reproduce the original UNet."""
    from tchvp_tpu.cli import main
    from tchvp_tpu.config import UNetConfig
    from tchvp_tpu.models import UNet
    from tchvp_tpu.train import checkpoint as ckpt

    t = load_source_classes("UNet", ["UNet"])["UNet"](3, 1, 8).eval()
    _randomize_torch_bn(t)
    src = str(tmp_path / "unet.pth")
    torch.save(t.state_dict(), src)
    out = str(tmp_path / "ported")
    main(["port", "--model", "unet", "--checkpoint", src, "--out", out])

    restored = ckpt.restore_state(ckpt.latest_step_dir(out))
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    x = np.random.default_rng(6).uniform(size=(1, 32, 32, 3)).astype(np.float32)
    want = t(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    got = UNet(config=UNetConfig(init_features=8)).apply(
        variables, jnp.asarray(x)
    )
    _close(np.asarray(got).transpose(0, 3, 1, 2), want, "cli port roundtrip")


def test_ported_checkpoint_serves_int8():
    """The full switch-from-the-reference journey: an original AE_32K
    checkpoint imports via torch_port and serves through the int8 PTQ
    engine — output stays faithful to the EXECUTED original torch model
    (quantization noise only)."""
    from tchvp_tpu.config import ResNetAEConfig
    from tchvp_tpu.infer import Int8Engine
    from tchvp_tpu.models import Autoencoder32K

    cl = load_pyc_classes(
        "AE_32K", ["Bottleneck", "Encoder_32K", "Decoder_32K", "Autoencoder32K"]
    )
    t = cl["Autoencoder32K"]("image").eval()
    _randomize_torch_bn(t)
    variables = torch_port.import_autoencoder32k(t.state_dict())

    m = Autoencoder32K(config=ResNetAEConfig(layers=(3, 4)))
    x = np.random.default_rng(7).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    eng = Int8Engine(m, variables).calibrate([jnp.asarray(x)])
    _, rec = jax.jit(
        lambda qp, v, b: eng.apply(qp, b, variables=v)
    )(eng.qparams, variables, jnp.asarray(x))

    with torch.no_grad():
        want = t(torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    got = np.asarray(rec).transpose(0, 3, 1, 2)
    mse = float(np.mean((got - want.numpy()) ** 2))
    rng_ = float(want.numpy().max() - want.numpy().min())
    psnr = 20 * np.log10(max(rng_, 1e-9)) - 10 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, f"ported+int8 vs executed original: {psnr:.1f} dB"
