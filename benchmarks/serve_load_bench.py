#!/usr/bin/env python
"""Serving load test: N concurrent clients against `tchvp serve`.

Round-3 verdict weak #7: `_MicroBatcher`/`_Sessions` had correctness
tests only — no load numbers. This drives a served artifact with
concurrent clients mixing batch shapes, a streaming session, and a
malformed request, and reports end-to-end p50/p99 latency, error rate,
throughput, and coalescing effectiveness (from /health). Results land in
BENCHES.md.

Run (CPU works; shapes are tiny so the model call is ms-scale):
  python benchmarks/serve_load_bench.py
Env: LOAD_CLIENTS (default 8), LOAD_REQUESTS per client (default 20),
LOAD_WINDOW_MS (default 20), LOAD_SIZE/LOAD_CLIP (default 32/4).

LOAD_PIPE=1 (round-5): drive the LIVE pipelined serving mode instead —
`tchvp serve --mesh data=2,pipe=2` semantics (serve_live_pipelined) on
a virtual 4-device CPU mesh; same clients, same malformed-request
probe, streaming phase skipped (orthogonal to pp).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

PIPE = os.environ.get("LOAD_PIPE") == "1"
if os.environ.get("LOAD_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    if PIPE:
        jax.config.update("jax_num_cpu_devices", 4)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SIZE = int(os.environ.get("LOAD_SIZE", "32"))
CLIP = int(os.environ.get("LOAD_CLIP", "4"))
CLIENTS = int(os.environ.get("LOAD_CLIENTS", "8"))
REQUESTS = int(os.environ.get("LOAD_REQUESTS", "20"))
WINDOW_MS = float(os.environ.get("LOAD_WINDOW_MS", "20"))


def _export(tmp: str) -> str:
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.infer import export as export_lib
    from tchvp_tpu.models import VideoHybridNet

    model = VideoHybridNet(config=flagship_video_config(image_size=SIZE))
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP, SIZE, SIZE, 3))
    )
    exported, w = export_lib.export_video_model(
        model, vs, clip_len=CLIP, image_size=SIZE
    )
    path = os.path.join(tmp, "m.tchvp")
    export_lib.save_artifact(
        path, exported, w,
        meta={"model": "hybrid", "image_size": SIZE, "clip_len": CLIP},
    )
    return path


def _serve_pipelined():
    """LIVE pipelined server over a data=2 x pipe=2 mesh (LOAD_PIPE=1)."""
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.infer.server import serve_live_pipelined
    from tchvp_tpu.models import VideoHybridNet
    from tchvp_tpu.parallel import make_mesh

    model = VideoHybridNet(
        config=flagship_video_config(image_size=SIZE, num_layers=2)
    )
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP, SIZE, SIZE, 3))
    )
    mesh = make_mesh(("data", "pipe"), (2, 2), jax.devices()[:4])
    return serve_live_pipelined(
        model, vs, mesh, axis="pipe", batch_axis="data",
        image_size=SIZE, clip_len=CLIP,
        port=0, buckets=(2, 4), batch_window_ms=WINDOW_MS,
    )


def main() -> None:
    from tchvp_tpu.infer.server import post_npy, serve_artifact

    tmp = tempfile.mkdtemp(prefix="tchvp_load_")
    if PIPE:
        srv = _serve_pipelined()
    else:
        path = _export(tmp)
        srv = serve_artifact(
            path, port=0, buckets=(1, 2, 4), batch_window_ms=WINDOW_MS
        )
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"

    lat: list = []
    errors: list = []
    lock = threading.Lock()

    def client(cid: int) -> None:
        rng = np.random.default_rng(cid)
        for i in range(REQUESTS):
            b = int(rng.choice([1, 1, 2, 4]))  # mixed shapes, mostly small
            batch = rng.integers(
                0, 255, (b, CLIP, SIZE, SIZE, 3), dtype=np.uint8
            )
            t0 = time.perf_counter()
            try:
                out = post_npy(f"{base}/infer", batch)
                dt = time.perf_counter() - t0
                assert out.shape[0] == b
                with lock:
                    lat.append((dt, b))
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")

    def malformed_client() -> None:
        # Garbage body: must 4xx, must not kill the server.
        for _ in range(5):
            req = urllib.request.Request(
                f"{base}/infer", data=b"not-an-npy", method="POST"
            )
            try:
                urllib.request.urlopen(req, timeout=60)
                with lock:
                    errors.append("malformed request was ACCEPTED")
            except urllib.error.HTTPError:
                pass  # expected
            time.sleep(0.01)

    # Warm each bucket once so steady-state latency excludes compiles.
    for b in (2, 4) if PIPE else (1, 2, 4):
        post_npy(f"{base}/infer", np.zeros(
            (b, CLIP, SIZE, SIZE, 3), np.uint8
        ))

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(CLIENTS)
    ] + [threading.Thread(target=malformed_client)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    health = json.loads(
        urllib.request.urlopen(f"{base}/health", timeout=60).read()
    )
    srv.shutdown()

    times = sorted(d for d, _ in lat)
    clips = sum(b for _, b in lat)
    out = {
        "clients": CLIENTS,
        "requests_ok": len(lat),
        "errors": len(errors),
        "error_samples": errors[:3],
        "window_ms": WINDOW_MS,
        "p50_ms": round(1000 * times[len(times) // 2], 1),
        "p99_ms": round(1000 * times[int(len(times) * 0.99) - 1], 1),
        "wall_s": round(wall, 2),
        "req_per_s": round(len(lat) / wall, 1),
        "clips_per_s": round(clips / wall, 1),
        "coalesced_calls": health.get("coalesced_calls", 0),
        "coalesced_requests": health.get("coalesced_requests", 0),
        "server_errors": health.get("errors", 0),
    }
    if PIPE:
        out["mode"] = "live_pipelined_dp2xpp2"
    else:
        out["streaming"] = _streaming_phase(tmp)
    print(json.dumps(out))
    if errors:
        raise SystemExit(f"{len(errors)} client errors: {errors[:3]}")


def _streaming_phase(tmp: str) -> dict:
    """K concurrent stateful sessions against a STREAMING artifact
    (server-side carry, infer/server.py::_Sessions)."""
    from tchvp_tpu.config import flagship_video_config
    from tchvp_tpu.infer import export as export_lib
    from tchvp_tpu.infer.server import post_npy, serve_artifact
    from tchvp_tpu.models import VideoHybridNet

    model = VideoHybridNet(config=flagship_video_config(image_size=SIZE))
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP, SIZE, SIZE, 3))
    )
    exported, w = export_lib.export_streaming_step(
        model, vs, chunk_len=CLIP, ctx_frames=1, image_size=SIZE, batch=1,
    )
    path = os.path.join(tmp, "s.tchvp")
    export_lib.save_artifact(
        path, exported, w,
        meta=export_lib.streaming_meta(
            chunk_len=CLIP, ctx_frames=1, image_size=SIZE, batch=1,
            tokens_per_frame=model.config.tokens_per_frame,
        ),
    )
    srv = serve_artifact(path, port=0)
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"
    k = max(2, CLIENTS // 2)
    chunks = max(4, REQUESTS // 2)
    lat: list = []
    errs: list = []
    lock = threading.Lock()

    def session_client(cid: int) -> None:
        rng = np.random.default_rng(100 + cid)
        try:
            opened = json.loads(urllib.request.urlopen(
                urllib.request.Request(f"{base}/stream/open", method="POST"),
                timeout=120,
            ).read())
            sid = opened["session"]
            for _ in range(chunks):
                chunk = rng.integers(
                    0, 255, (1, CLIP, SIZE, SIZE, 3), dtype=np.uint8
                )
                t0 = time.perf_counter()
                post_npy(f"{base}/stream/{sid}", chunk)
                with lock:
                    lat.append(time.perf_counter() - t0)
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/stream/{sid}/close", method="POST"
                ), timeout=120,
            )
        except Exception as e:  # noqa: BLE001
            with lock:
                errs.append(f"{type(e).__name__}: {e}")

    threads = [
        threading.Thread(target=session_client, args=(i,)) for i in range(k)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    srv.shutdown()
    times = sorted(lat)
    return {
        "sessions": k,
        "chunks_ok": len(lat),
        "errors": len(errs),
        "error_samples": errs[:3],
        "p50_ms": round(1000 * times[len(times) // 2], 1) if times else None,
        "p99_ms": (
            round(1000 * times[max(0, int(len(times) * 0.99) - 1)], 1)
            if times else None
        ),
        "chunks_per_s": round(len(lat) / wall, 1),
    }


if __name__ == "__main__":
    main()
