"""AOT serving artifacts: compiled-model export via ``jax.export``.

The reference deploys by shipping the Python model code + a torch
checkpoint and re-running eager torch at the destination
(``/root/reference/FCT.py:410-412`` instant-start eager inference;
``Model.py:17`` checkpoint load). The TPU-native serving story is
ahead-of-time: trace + lower the jitted inference function ONCE, and ship
the lowered StableHLO — the serving fleet needs jax and this loader, not
the model zoo, and gets bit-identical programs with zero retrace risk.

One artifact = one zip file:

* ``fn.jaxexp`` — ``jax.export`` serialization of ``fn(weights, batch)``
  (StableHLO + calling convention). Weights ride as an *argument*, not
  baked constants — a flagship's hundreds of MB of params would bloat
  the program and blow tunneled-compile request limits
  (same rule as ``__graft_entry__.entry``).
* ``weights.msgpack`` — the weight pytree (flax serialization).
* ``meta.json`` — artifact version, platforms, input spec, user metadata.

Batch-polymorphic by default: the batch dim is exported symbolically
(``jax.export.symbolic_shape``), so one artifact serves any batch size;
set ``symbolic_batch=False`` for models whose lowering needs a static
batch. Multi-platform: pass ``platforms=("tpu", "cpu")`` to lower for
both — the same file serves on a TPU pod and on a CPU canary.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from jax import export as jax_export

ARTIFACT_VERSION = 1
_FN_NAME = "fn.jaxexp"
_WEIGHTS_NAME = "weights.msgpack"
_META_NAME = "meta.json"


def export_serving(
    fn: Callable[[Any, jnp.ndarray], Any],
    weights: Any,
    example_batch: jnp.ndarray,
    *,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
) -> Tuple[jax_export.Exported, Any]:
    """Lower ``fn(weights, batch)`` ahead of time.

    Returns ``(exported, weights)`` ready for :func:`save_artifact`.
    ``platforms=None`` lowers for the current default backend; pass an
    explicit tuple (e.g. ``("tpu", "cpu")``) for a multi-platform
    artifact.
    """
    jitted = jax.jit(fn)
    if symbolic_batch:
        specs = jax_export.symbolic_args_specs(
            (weights, example_batch),
            (None, "b, " + ", ".join("_" * (example_batch.ndim - 1))),
        )
    else:
        # Dtype inspection must not move data: jnp.asarray would ship
        # every weight leaf to the device just to read .dtype (a full
        # checkpoint transfer over the tunnel before lowering starts).
        specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            (weights, example_batch),
        )
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax_export.export(jitted, **kw)(*specs)
    return exported, weights


def save_artifact(
    path: str,
    exported: jax_export.Exported,
    weights: Any,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Write the serving zip (StableHLO + weights + metadata)."""
    record = {
        "artifact_version": ARTIFACT_VERSION,
        "platforms": list(exported.platforms),
        "batch_aval": str(exported.in_avals[-1]),
        "out_avals": [str(a) for a in exported.out_avals],
        "meta": meta or {},
    }
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        z.writestr(_FN_NAME, exported.serialize())
        z.writestr(_WEIGHTS_NAME, serialization.to_bytes(weights))
        z.writestr(_META_NAME, json.dumps(record, indent=2))


class ServingModel:
    """A loaded artifact: ``model(batch)`` runs the AOT program.

    The deserialized program is re-verified by jax at call time; running
    on a platform the artifact was not lowered for raises — that is the
    point (no silent retrace/recompile in serving).
    """

    def __init__(self, exported: jax_export.Exported, weights: Any,
                 meta: Dict[str, Any]):
        self._exported = exported
        self._weights = weights
        self._on_device = False
        self.meta = meta

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self._exported.platforms)

    def example_input(self, batch_size: int = 1) -> Any:
        """A zeros batch matching the program's input calling convention.

        Shape and dtype come from the exported batch aval (the last
        flattened arg — see ``save_artifact``'s ``batch_aval`` record),
        with any symbolic dim (the polymorphic batch) pinned to
        ``batch_size``; static dims (incl. a static batch) are kept.
        Lets callers warm up/smoke-test any artifact without relying on
        optional ``meta`` fields or guessing the wire dtype.
        """
        import numpy as np

        aval = self._exported.in_avals[-1]
        shape = tuple(
            d if isinstance(d, int) else batch_size for d in aval.shape
        )
        return np.zeros(shape, np.dtype(aval.dtype))

    def __call__(self, batch: jnp.ndarray) -> Any:
        if not self._on_device:
            # Pin weights to device ONCE — serving from host numpy would
            # re-transfer the whole weight pytree on every call (74 MB
            # per request for the flagship; brutal over a tunnel).
            self._weights = jax.tree.map(jnp.asarray, self._weights)
            self._on_device = True
        return self._exported.call(self._weights, batch)

    def over_mesh(self, mesh=None, axis: str = "data") -> "DataParallelServingModel":
        """Data-parallel serving over a device mesh.

        Returns a wrapper whose calls split the request batch along dim 0
        over ``mesh``'s ``axis`` and run the exported single-chip program
        as N SPMD copies via ``shard_map`` (weights replicated once) — N
        chips serve one request at ~1/N the latency. The reference's
        serving story is single-``cuda:0`` by construction
        (``FCT.py:276``); scaling out is a TPU-native addition.

        ``mesh=None`` builds a 1-D mesh over all local devices.
        """
        return DataParallelServingModel(self, mesh=mesh, axis=axis)


class DataParallelServingModel:
    """N SPMD copies of one exported program; batches split along dim 0.

    Soundness rests on the same invariant the server's batch-bucket
    padding uses: every artifact maps clips independently along the
    batch dim, so per-device shards compute exactly what the one-device
    program would on those rows. No collectives are involved —
    ``shard_map`` here is placement, not communication. Outputs match
    the single-device call row for row up to compilation-level float
    reassociation (XLA schedules the batch-B/N program differently from
    the batch-B one; ~1e-7 — asserted in ``tests/test_server.py``).
    """

    def __init__(self, base: ServingModel, mesh=None, axis: str = "data"):
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), (axis,))
        if axis not in mesh.axis_names:
            raise ValueError(
                f"axis {axis!r} not in mesh axes {mesh.axis_names}"
            )
        self.meta = base.meta
        self.mesh = mesh
        self.axis = axis
        self.n_devices = int(mesh.shape[axis])
        self._exported = base._exported
        # Replicate the weights across the mesh ONCE (the single-device
        # path pins to one device; here every device needs its copy).
        self._weights = jax.device_put(
            base._weights, NamedSharding(mesh, P())
        )
        self._batch_sharding = NamedSharding(mesh, P(axis))
        exported = self._exported

        def _dp_call(w, b):
            from tchvp_tpu.ops import dispatch_trace

            dispatch_trace.record("serving_dp_shard_map")
            return exported.call(w, b)

        self._jitted = jax.jit(jax.shard_map(
            _dp_call, mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(axis),
        ))

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self._exported.platforms)

    def example_input(self, batch_size: int = 0) -> Any:
        """Defaults to one row per mesh device (the minimum batch)."""
        return ServingModel.example_input(
            self, batch_size or self.n_devices
        )

    def __call__(self, batch: jnp.ndarray) -> Any:
        b = int(batch.shape[0])
        if b % self.n_devices:
            raise ValueError(
                f"data-parallel serving over {self.n_devices} devices "
                f"needs batch % {self.n_devices} == 0, got {b} (configure "
                f"server buckets as multiples of the mesh size)"
            )
        batch = jax.device_put(batch, self._batch_sharding)
        return self._jitted(self._weights, batch)


def load_artifact(path: str) -> ServingModel:
    with zipfile.ZipFile(path, "r") as z:
        meta = json.loads(z.read(_META_NAME).decode("utf-8"))
        if meta.get("artifact_version") != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {meta.get('artifact_version')} "
                f"!= supported {ARTIFACT_VERSION}"
            )
        exported = jax_export.deserialize(z.read(_FN_NAME))
        # Weight pytree structure/dtypes travel inside the msgpack blob:
        # from_bytes with a None template reconstructs plain dict/list
        # trees, which is exactly what flax variables are.
        weights = serialization.msgpack_restore(z.read(_WEIGHTS_NAME))
    # msgpack_restore yields numpy arrays; push to device lazily at the
    # first call (jax handles host arrays as operands).
    if meta.get("meta", {}).get("streaming"):
        return StreamingServingModel(exported, weights, meta)
    return ServingModel(exported, weights, meta)


def export_video_model(
    model,
    variables: Any,
    *,
    clip_len: int,
    image_size: int,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
    preprocess: bool = True,
) -> Tuple[jax_export.Exported, Any]:
    """Flagship-style clip model -> AOT artifact contents.

    Exports ``batch (B,T,H,W,3) -> reconstruction`` (uint8 in when
    ``preprocess=True`` — the fused on-device uint8->float->resize path
    rides inside the program, mirroring the jitted training step's
    data handling).
    """
    from tchvp_tpu.data import pipeline

    def fn(weights, batch):
        x = (
            pipeline.preprocess_clip(batch, image_size)
            if preprocess
            else batch
        )
        _, recon = model.apply(weights, x)
        return recon

    dtype = jnp.uint8 if preprocess else jnp.float32
    example = jnp.zeros((1, clip_len, image_size, image_size, 3), dtype)
    return export_serving(
        fn, variables, example,
        platforms=platforms, symbolic_batch=symbolic_batch,
    )


def export_image_model(
    model,
    variables: Any,
    *,
    image_size: int,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
    preprocess: bool = True,
) -> Tuple[jax_export.Exported, Any]:
    """Per-image model (FCT / UNet / AutoEncoder / combined) -> AOT
    artifact contents: ``batch (B,H,W,3) -> output``.

    Covers the reference's image workloads the same way
    :func:`export_video_model` covers clips: uint8 in (fused
    normalize+resize when ``preprocess=True``), eval-mode apply (running
    batch stats, no dropout). Tuple-returning models (AutoEncoder's
    ``(latent, recon)``, Image2Image2Mask's ``(latent, recon, mask)``)
    serve their LAST output — the reconstruction/mask the reference's
    own eval loops consume (``Model.py:115-132``, notebook cell 8).
    """
    from tchvp_tpu.data import pipeline

    def fn(weights, batch):
        x = (
            pipeline.preprocess_images(batch, image_size)
            if preprocess
            else batch
        )
        out = model.apply(weights, x)
        return out[-1] if isinstance(out, tuple) else out

    dtype = jnp.uint8 if preprocess else jnp.float32
    example = jnp.zeros((1, image_size, image_size, 3), dtype)
    return export_serving(
        fn, variables, example,
        platforms=platforms, symbolic_batch=symbolic_batch,
    )


def export_streaming_step(
    model,
    variables: Any,
    *,
    chunk_len: int,
    ctx_frames: int,
    image_size: int,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> Tuple[jax_export.Exported, Any]:
    """Export the STREAMING carry step: ``fn(weights, carry, chunk) ->
    (new_carry, recon)``.

    The exact per-chunk computation of
    :func:`tchvp_tpu.models.streaming.stream_clip`'s scan body (pinned by
    ``tests/test_export.py::test_streaming_artifact_matches_stream_clip``),
    lowered AOT so a serving host can run long-video inference statefully:
    the carry is the raw encoder tokens of the last ``ctx_frames`` frames,
    each chunk's temporal attention sees [context || chunk], and only the
    chunk's tokens are decoded. Static shapes throughout (a streaming
    session has one fixed geometry; no symbolic dims).
    """
    from tchvp_tpu.data import pipeline
    from tchvp_tpu.models.streaming import VideoHybridNet as _V

    if ctx_frames > chunk_len:
        raise ValueError("ctx_frames must be <= chunk_len")
    tpf = model.config.tokens_per_frame
    ctx_tokens = ctx_frames * tpf
    d = (image_size // 4) ** 2

    # Wire dtype for the carry is ALWAYS float32 (lossless from bf16):
    # clients/servers hold it in plain numpy between chunks.
    def fn(weights, carry, chunk):
        x = pipeline.preprocess_clip(chunk, image_size)
        tokens, hw = model.apply(weights, x, method=_V.encode_clip)
        if ctx_tokens:
            mixed = model.apply(
                weights,
                jnp.concatenate([carry.astype(tokens.dtype), tokens], axis=1),
                method=_V.temporal_mix,
            )
            out_tokens = mixed[:, ctx_tokens:]
            new_carry = tokens[:, -ctx_tokens:].astype(jnp.float32)
        else:
            out_tokens = model.apply(weights, tokens, method=_V.temporal_mix)
            new_carry = carry
        recon = model.apply(weights, out_tokens, hw, method=_V.decode_tokens)
        return new_carry, recon

    carry0 = jnp.zeros((batch, ctx_tokens, d), jnp.float32)
    chunk0 = jnp.zeros(
        (batch, chunk_len, image_size, image_size, 3), jnp.uint8
    )
    jitted = jax.jit(fn)
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (variables, carry0, chunk0),
    )
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax_export.export(jitted, **kw)(*specs)
    return exported, variables


def export_int8_streaming_step(
    engine,
    *,
    chunk_len: int,
    ctx_frames: int,
    image_size: int,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[jax_export.Exported, Any]:
    """int8 PTQ version of :func:`export_streaming_step`: the carry step
    runs through the calibrated :class:`Int8Engine`'s interceptor (int8
    conv/dense math, activation scales frozen into the HLO), weights ride
    as ``{"qparams", "variables"}`` like :func:`export_int8_video_model`.
    """
    from tchvp_tpu.data import pipeline
    from tchvp_tpu.models.streaming import VideoHybridNet as _V

    if engine.qparams is None:
        raise ValueError("engine is not calibrated (call calibrate() first)")
    model = engine.model
    if ctx_frames > chunk_len:
        raise ValueError("ctx_frames must be <= chunk_len")
    tpf = model.config.tokens_per_frame
    ctx_tokens = ctx_frames * tpf
    d = (image_size // 4) ** 2

    def fn(weights, carry, chunk):
        x = pipeline.preprocess_clip(chunk, image_size, dtype=compute_dtype)
        with engine.intercepting(weights["qparams"]):
            variables = weights["variables"]
            tokens, hw = model.apply(variables, x, method=_V.encode_clip)
            if ctx_tokens:
                mixed = model.apply(
                    variables,
                    jnp.concatenate(
                        [carry.astype(tokens.dtype), tokens], axis=1
                    ),
                    method=_V.temporal_mix,
                )
                out_tokens = mixed[:, ctx_tokens:]
                new_carry = tokens[:, -ctx_tokens:].astype(jnp.float32)
            else:
                out_tokens = model.apply(
                    variables, tokens, method=_V.temporal_mix
                )
                new_carry = carry
            recon = model.apply(
                variables, out_tokens, hw, method=_V.decode_tokens
            )
        return new_carry, recon

    weights = {"qparams": engine.qparams, "variables": engine.variables}
    carry0 = jnp.zeros((batch, ctx_tokens, d), jnp.float32)
    chunk0 = jnp.zeros(
        (batch, chunk_len, image_size, image_size, 3), jnp.uint8
    )
    jitted = jax.jit(fn)
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (weights, carry0, chunk0),
    )
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax_export.export(jitted, **kw)(*specs)
    return exported, weights


def streaming_meta(
    *, chunk_len: int, ctx_frames: int, image_size: int,
    batch: int, tokens_per_frame: int, carry_dtype: str = "float32",
) -> Dict[str, Any]:
    """The ``meta`` dict a streaming artifact must carry (consumed by
    :class:`StreamingServingModel` and the serving daemon's /stream
    endpoints)."""
    return {
        "streaming": True,
        "chunk_len": chunk_len,
        "ctx_frames": ctx_frames,
        "image_size": image_size,
        "batch": batch,
        "carry_shape": [
            batch, ctx_frames * tokens_per_frame, (image_size // 4) ** 2
        ],
        "carry_dtype": carry_dtype,
    }


class StreamingServingModel(ServingModel):
    """A loaded STREAMING artifact: ``step(carry, chunk)`` advances one
    chunk; ``init_carry()`` is the fresh-session state."""

    @property
    def stream_meta(self) -> Dict[str, Any]:
        return self.meta["meta"]

    def init_carry(self):
        import numpy as np

        return np.zeros(
            tuple(self.stream_meta["carry_shape"]),
            np.dtype(self.stream_meta.get("carry_dtype", "float32")),
        )

    def step(self, carry, chunk):
        if not self._on_device:
            self._weights = jax.tree.map(jnp.asarray, self._weights)
            self._on_device = True
        return self._exported.call(self._weights, carry, chunk)

    def __call__(self, batch):  # pragma: no cover - guidance error
        raise TypeError(
            "streaming artifact: use step(carry, chunk) / the /stream "
            "endpoints, not whole-batch __call__"
        )


def export_int8_video_model(
    engine,
    *,
    clip_len: int,
    image_size: int,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> Tuple[jax_export.Exported, Any]:
    """Export a calibrated :class:`~tchvp_tpu.infer.quant.Int8Engine`.

    The int8 weights AND the fp variables ride in the artifact's weight
    pytree (``{"qparams", "variables"}``); the per-layer activation
    scales are scalars baked into the program (they are the calibration
    result — freezing them is the point of PTQ serving). The exported
    program is the int8 interceptor-rewritten forward: int8 MXU matmuls,
    dequant epilogues, uint8 preprocessing fused in front.
    """
    from tchvp_tpu.data import pipeline

    if engine.qparams is None:
        raise ValueError("engine is not calibrated (call calibrate() first)")

    def fn(weights, batch):
        x = pipeline.preprocess_clip(batch, image_size, dtype=compute_dtype)
        out = engine.apply(weights["qparams"], x, weights["variables"])
        return out[1] if isinstance(out, tuple) else out

    weights = {"qparams": engine.qparams, "variables": engine.variables}
    example = jnp.zeros((1, clip_len, image_size, image_size, 3), jnp.uint8)
    return export_serving(
        fn, weights, example,
        platforms=platforms, symbolic_batch=symbolic_batch,
    )
