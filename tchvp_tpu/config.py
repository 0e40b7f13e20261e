"""Typed configuration for every workload.

The reference hardcodes all of these as module globals / magic constants
(survey §5.6): ``Model.py:17-21`` (DEVICE/BATCH_SIZE/MODEL_NAME/dirs),
``FCT.py:214-218`` (att_heads/filters/stochastic depth), ``UNet.py:8``
(init_features), recovered ``AE_32K.py`` (latent shapes, lr, batch), and
call-site hyperparameters (``FCT.py:411``, ``Model.py:212``).

Here they are first-class, typed, and serializable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Mixed-precision policy: fp32 params, bf16 compute by default on TPU."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    @staticmethod
    def fp32() -> "DTypePolicy":
        return DTypePolicy(compute_dtype=jnp.float32)

    @staticmethod
    def bf16() -> "DTypePolicy":
        return DTypePolicy(compute_dtype=jnp.bfloat16)


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AutoEncoderConfig:
    """Plain conv AE (reference ``AutoEncoder.py:73-134``).

    ``filters`` default mirrors ``AutoEncoder.py:76``; the notebook variant
    (ipynb cell 4 L72) uses ``(8, 16, 32, 64, 128, 512)`` giving the
    (B, 4, 4, 512) latent recorded in the notebook's golden output.
    """

    filters: Sequence[int] = (8, 16, 32, 64, 128)
    out_channels: int = 3
    dropout_rate: float = 0.3

    @staticmethod
    def notebook_variant() -> "AutoEncoderConfig":
        return AutoEncoderConfig(filters=(8, 16, 32, 64, 128, 512))


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Classic 4-down/4-up UNet (reference ``UNet.py:6-66``)."""

    in_channels: int = 3
    out_channels: int = 1
    init_features: int = 32


@dataclasses.dataclass(frozen=True)
class SobelConfig:
    """Sobel edge visualization (reference ``FCT.py:398-402``).

    ``edge_floor_rel``: max gradient below this fraction of the input
    range counts as "no edges" — output is zero instead of the
    reference's divide-by-zero NaNs (or fp rounding residue amplified
    to full scale by the max-normalize). ``eps`` guards a zero input.
    """

    edge_floor_rel: float = 1e-5
    eps: float = 1e-8


@dataclasses.dataclass(frozen=True)
class FCTConfig:
    """Fully Convolutional Transformer (reference ``FCT.py:210-254``)."""

    att_heads: int = 2
    filters: Sequence[int] = (8, 16, 32, 64, 128, 64, 32, 16, 8)
    # Max drop-path rate: per-block rates follow the reference's linspace
    # schedule (FCT.py:217-218). The reference computes dpr but never
    # consumes it; here > 0.0 actually gates the transformer residual
    # branches (ops/conv_attention.py::drop_path). 0.0 = reference math.
    stochastic_depth_rate: float = 0.0
    dropout_rate: float = 0.3  # FCT.py:146,176
    out_channels: int = 1
    # "auto" = Pallas flash on TPU (faster + much cheaper to compile for
    # the H*W-token spatial attention), XLA einsum elsewhere. "ring" =
    # context parallelism for the H*W-token FULL attention: spatial
    # tokens shard over `seq_axis` and k/v blocks rotate by ppermute
    # (ops/attention.py::sdpa_ring_seq_sharded) — the scale-out path for
    # big-resolution FCT where one chip can't hold the token count.
    attn_impl: str = "auto"  # "auto" | "xla" | "flash" | "ring"
    # Mesh axis for ring attention; None = off (single-device math).
    seq_axis: Optional[str] = None
    # Mesh axis for SPATIAL partitioning of the conv stages: image rows
    # shard over this axis (GSPMD halo exchanges per conv; indivisible
    # deep levels auto-skip). Pair with attn_impl="ring" +
    # seq_axis=<same axis> so the H*W-token attention circulates k/v
    # over the same shards instead of gathering — fully distributed
    # big-resolution FCT. None = off.
    sp_axis: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class ResNetAEConfig:
    """ResNet-bottleneck AE family (recovered ``AE_32K.py`` / ``AE_64_4k.py``).

    ``layers`` mirrors ``Encoder_32K(Bottleneck, [3, 4])`` (AE_32K L177).
    ``output_type`` switches the decoder head: "image" -> 3ch+ReLU,
    "mask" -> 1ch+sigmoid (AE_32K L151-158).
    ``token_latent``: reshape latent (B, H', W', 8) -> (B, 8, H'*W') token
    sequence as in AE_256_32K L118-119.
    ``vae``: the dead ``reparameterize`` hook (AE_256_32K L141-147),
    exposed as an optional flag per survey §7.5, default off.
    """

    layers: Sequence[int] = (3, 4)
    stem_features: int = 64
    squeeze_features: Sequence[int] = (128, 64, 16, 8)
    output_type: str = "image"
    dropout_rate: float = 0.3
    token_latent: bool = False
    vae: bool = False
    # Mesh axis for tensor-parallel channel sharding: NHWC channel dims
    # constrained onto this axis after every conv stage (stem, bottleneck
    # blocks, squeeze chain, decoder chains), so GSPMD partitions the conv
    # compute over output channels (parallel/tp.py::conv_constrain).
    # Narrow dims (RGB/mask heads) auto-skip. None = off.
    tp_axis: Optional[str] = None
    # Mesh axis for SPATIAL partitioning: image rows (NHWC dim 1) shard
    # over this axis through the whole conv stack — GSPMD inserts halo
    # exchanges (collective-permute of boundary rows per conv, no
    # gathers), the scale-out for resolutions one chip can't hold.
    # Indivisible heights auto-skip. None = off.
    sp_axis: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """From-scratch temporal transformer (recovered ``TransformerEncoder.py``).

    ``relu_qkv`` reproduces the reference's unusual ReLU on projected
    q/k/v (TransformerEncoder.py L17, L70). ``scale_out`` reproduces the
    x sqrt(0.5) output scaling (L122). The reference's always-on dropout in
    eval (L123) is NOT reproduced (survey §7.5 quirk registry) — dropout is
    deterministic in eval mode here.
    """

    input_dim: int = 4096
    hidden_dim: int = 2048
    num_layers: int = 2
    num_heads: int = 8
    dropout_rate: float = 0.1
    relu_qkv: bool = True
    scale_out: bool = True
    # "ring" = FULL attention over seq-sharded tokens via a k/v ring
    # rotation (context parallelism; requires seq_axis, window_size 0).
    attn_impl: str = "xla"  # "xla" | "flash" | "windowed" | "auto" | "ring"
    window_size: int = 0  # 0 = full attention; >0 = overlapping windows
    # Mesh axis name for tensor-parallel activation sharding (q/k/v heads
    # and the FFN hidden dim split over this axis; requires an ambient
    # `with mesh:` context and num_heads % axis_size == 0). None = off.
    tp_axis: Optional[str] = None
    # Mesh axis for TRUE sequence-parallel windowed attention: tokens stay
    # sharded over this axis through the attention — each shard exchanges
    # one window of k/v with its left neighbor via ppermute (O(window)
    # ICI bytes) instead of GSPMD all-gathering the whole sequence.
    # Requires window_size > 0 and (S / axis_size) % window_size == 0;
    # no-op without an ambient mesh carrying the axis. None = off.
    seq_axis: Optional[str] = None
    # Mixture-of-Experts FFN (build-new component — the reference's FFNs
    # are all dense, recovered TransformerEncoder.py L107): num_experts
    # >= 2 replaces each layer's Linear->ReLU->Linear FFN with a
    # Switch-style top-1 routed pool of that exact shape per expert
    # (ops/moe.py). 0 (default) keeps the reference math everywhere.
    num_experts: int = 0
    # Static per-expert slot headroom over the perfectly-balanced share;
    # tokens past capacity fall through to the residual connection (the
    # per-layer dropped fraction is sown as MoE telemetry — ops/moe.py).
    expert_capacity_factor: float = 1.25
    # Routing fan-out: 1 = Switch top-1 (default); 2 = GShard-style top-2
    # with renormalized gates (ops/moe.py::MoEFFN.top_k).
    router_top_k: int = 1
    # Mesh axis for TRUE expert parallelism: expert weights shard over
    # this axis (shard_map; one psum combines the disjoint partial
    # outputs). No-op without an ambient mesh carrying the axis.
    ep_axis: Optional[str] = None


def flagship_video_config(
    image_size: int = 224,
    num_heads: int = 8,
    hidden_dim: int = 2048,
    num_layers: int = 2,
    attn_impl: str = "xla",
    window_size: int = 0,
    num_experts: int = 0,
    router_top_k: int = 1,
    ep_axis: Optional[str] = None,
    seq_axis: Optional[str] = None,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
) -> "VideoModelConfig":
    """The benchmark flagship: per-frame CNN encoder -> temporal transformer
    -> decoder at the BASELINE 224x224x16-frame operating point. The token
    embedding dim is the flattened latent map, (image_size/4)^2.
    ``num_experts >= 2`` swaps the temporal FFNs for routed Switch-MoE
    pools (ops/moe.py); 0 keeps the reference-dense math."""
    d = (image_size // 4) ** 2
    if d % num_heads:
        raise ValueError(f"latent dim {d} not divisible by {num_heads} heads")
    return VideoModelConfig(
        # tp_axis reaches the CNN too: conv channel dims shard over the
        # same "model" axis as the transformer's heads/FFN hidden;
        # sp_axis spatially partitions the per-frame convs (frame rows).
        encoder=ResNetAEConfig(
            token_latent=True, tp_axis=tp_axis, sp_axis=sp_axis
        ),
        temporal=TransformerConfig(
            input_dim=d,
            hidden_dim=hidden_dim,
            num_layers=num_layers,
            num_heads=num_heads,
            attn_impl=attn_impl,
            window_size=window_size,
            num_experts=num_experts,
            router_top_k=router_top_k,
            ep_axis=ep_axis,
            seq_axis=seq_axis,
            tp_axis=tp_axis,
        )
    )


@dataclasses.dataclass(frozen=True)
class VideoModelConfig:
    """Flagship video pipeline: CNN encoder -> temporal transformer -> decoder.

    Capability-equivalent to the reference's latent video pipeline
    (survey §3.5: Encoder_32K per frame -> TransformerEncoder over frame
    latents -> Decoder_32K), redesigned TPU-first: frames folded into the
    batch for convs, flash-attention over temporal tokens, optional
    windowing for long/streaming clips.
    """

    encoder: ResNetAEConfig = dataclasses.field(
        default_factory=lambda: ResNetAEConfig(token_latent=True)
    )
    temporal: TransformerConfig = dataclasses.field(
        default_factory=TransformerConfig
    )
    output_type: str = "image"
    use_posenc: bool = True
    tokens_per_frame: int = 8  # latent channels become tokens (AE_256_32K L118)


# ---------------------------------------------------------------------------
# Data / training configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """CSV-manifest data layer (reference ``Dataloader.py`` / ``dataset.py``)."""

    train_csv: str = "Datasets/image2image/train.csv"
    val_csv: str = "Datasets/image2image/valid.csv"
    test_csv: str = "Datasets/image2image/test.csv"
    image_size: int = 256
    batch_size: int = 64  # Model.py:19
    training_type: str = "unsupervised"  # "supervised" | "unsupervised" | "sequential"
    clip_len: int = 8
    shuffle: bool = True
    drop_last: bool = True  # replaces dataset.py L21-22 len-truncation quirk
    data_fraction: float = 1.0  # DATA_SIZE cap (dataset.py L12)


@dataclasses.dataclass(frozen=True)
class IngestConfig:
    """Host-ingest tuning for the CSV-manifest fast path
    (``data/manifest.py``; no reference counterpart — the reference
    re-decodes every image per epoch, single-threaded).

    ``TCHVP_DECODE_THREADS`` / ``TCHVP_DECODE_CACHE_MB`` env vars
    override at runtime for ops use."""

    decode_threads: Optional[int] = None  # None = min(8, cpu_count)
    cache_mb: int = 2048  # decoded-frame RAM cache budget
    prefetch_depth: int = 2  # batches the prefetch thread runs ahead


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Denoising-AE augmentations (reference ``Model.py:44-53,106-109``)."""

    hflip_prob: float = 0.5
    noise_prob: float = 0.2
    noise_std: float = 0.05
    max_blackout_patches: int = 3
    blackout_size: int = 16
    test_blackout_size: int = 32
    # Beyond-reference suite (data/pipeline.py::augment_geometric),
    # applied to the CLEAN image before corruption so targets stay
    # consistent. All OFF by default = exact reference augmentation.
    rot90_prob: float = 0.0  # per-sample k*90-degree rotation
    crop_prob: float = 0.0  # per-sample fixed-fraction crop, resized back
    crop_frac: float = 0.875
    jitter_prob: float = 0.0  # brightness/contrast/saturation
    jitter_strength: float = 0.2


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 250  # Model.py:212
    lr: float = 1e-3  # Model.py:212, FCT.py:293 default
    weight_decay: float = 0.01  # torch AdamW default (FCT.py:305, Model.py:153)
    # "adamw" = reference parity (FCT.py:305); also "adam", "sgd"
    # (momentum 0.9 nesterov), "lion" (half the optimizer-state HBM).
    optimizer: str = "adamw"
    batch_size: int = 64
    loss: str = "mixed"  # "mixed" | "dice" | "mse"
    mixed_alpha: float = 0.5  # Model.py:156
    mixed_beta: float = 0.5
    # 1.0 is correct for [0,1] images. 255.0 reproduces the reference's
    # training objective exactly, quirk included: pytorch_msssim's default
    # data_range=255 on [0,1] inputs collapses the MS-SSIM term of
    # MixedLoss to ~0 (Metrics.py:53; ops/msssim.py quirk note).
    mixed_data_range: float = 1.0
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "runs"
    sample_dir: str = "saved_samples"
    model_name: str = "IMAGE2IMAGE"  # Model.py:20
    save_every: int = 5  # Model.py:184
    seed: int = 0
    mesh_axes: Tuple[str, ...] = ("data",)
    sync_batch_norm: bool = True
    dtype: str = "bfloat16"  # compute dtype for the jitted step
    # Weight on the Switch load-balance loss sown by MoE FFN layers
    # (ops/moe.py); 0.0 = not collected. Only meaningful when the model's
    # TransformerConfig.num_experts >= 2.
    moe_aux_weight: float = 0.0
    # LR schedule (train/state.py::make_lr_schedule). The reference is
    # constant-LR everywhere, so None/"constant" is parity; "cosine"
    # (warmup + cosine decay to lr*min_lr_ratio at total_steps) is a
    # TPU-build addition.
    schedule: Optional[str] = None
    warmup_steps: int = 0
    total_steps: int = 0
    min_lr_ratio: float = 0.0
    # EMA (Polyak) parameter averaging, kept in the optimizer state
    # (train/state.py::param_ema); 0.0 = off (reference parity).
    ema_decay: float = 0.0
    # Background (async) checkpoint writes: the train loop queues the
    # save and keeps stepping while orbax's thread commits to disk
    # (train/checkpoint.py::save_state(async_write=)).
    async_checkpoint: bool = False
    # Keep only the newest N step_* checkpoints (disk rotation,
    # train/checkpoint.py::prune_step_dirs); 0 = keep all (reference
    # behavior: its .tar files accumulate forever).
    keep_checkpoints: int = 0
    # Device-side input lookahead (data/device_prefetch.py): keep N
    # batches pre-placed on device so the H2D copy of batch i+1 overlaps
    # the compute of batch i; 0 = off (reference behavior: transfer on
    # the step's critical path). 2 hides the copy; more only buys slack
    # against host jitter at N extra batches of HBM.
    device_prefetch: int = 0


def dtype_policy(cfg: TrainConfig) -> DTypePolicy:
    return DTypePolicy(
        compute_dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    )
