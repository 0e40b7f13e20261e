"""HTTP serving daemon (infer/server.py, `tchvp serve`).

One exported artifact behind a localhost endpoint: .npy in, .npy out,
bit-identical to calling the loaded artifact directly, health/stats
live, malformed requests rejected without killing the server.
"""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.config import flagship_video_config
from tchvp_tpu.infer import export as export_lib
from tchvp_tpu.infer.server import post_npy, serve_artifact
from tchvp_tpu.models import VideoHybridNet

SIZE = 32
CLIP_LEN = 4


@pytest.fixture(scope="module")
def artifact_path(tmp_path_factory):
    cfg = flagship_video_config(image_size=SIZE)
    model = VideoHybridNet(config=cfg)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP_LEN, SIZE, SIZE, 3))
    )
    exported, w = export_lib.export_video_model(
        model, vs, clip_len=CLIP_LEN, image_size=SIZE
    )
    path = str(tmp_path_factory.mktemp("srv") / "m.tchvp")
    export_lib.save_artifact(
        path, exported, w,
        meta={"model": "hybrid", "image_size": SIZE, "clip_len": CLIP_LEN},
    )
    return path


@pytest.fixture(scope="module")
def served(artifact_path):
    # buckets (1, 2): batch 2 pads nothing, batch 1 pads nothing,
    # batch 3+ splits into 2+pad(1->2) chunks.
    srv = serve_artifact(artifact_path, port=0, buckets=(1, 2))
    srv.start()
    yield srv
    srv.shutdown()


def _batch(b, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (b, CLIP_LEN, SIZE, SIZE, 3), dtype=np.uint8
    )


def test_infer_roundtrip_matches_direct_call(served):
    batch = _batch(2, seed=3)
    url = f"http://127.0.0.1:{served.port}/infer"
    got = post_npy(url, batch)
    # Wire dtype is stdlib-numpy: bf16 outputs widen to f32 (lossless),
    # so a jax-free client can decode the response.
    assert got.dtype == np.float32
    want = np.asarray(served.model(batch)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0)  # same program, same bits
    # Symbolic batch dim: a different batch size on the same endpoint.
    got1 = post_npy(url, _batch(1, seed=4))
    assert got1.shape[0] == 1


def test_bucketed_batches_match_exact_batch(served):
    """Pad-to-bucket and split-over-cap must be bit-identical to running
    the true batch through the program (pad rows cannot leak)."""
    url = f"http://127.0.0.1:{served.port}/infer"
    for b in (3, 5):  # 3 = 2 + pad(1->2)... both exceed the cap of 2
        batch = _batch(b, seed=10 + b)
        got = post_npy(url, batch)
        want = np.asarray(served.model(batch))  # direct call: exact batch
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=1e-6,
        )


def test_health_reports_stats(served):
    url = f"http://127.0.0.1:{served.port}/health"
    before = json.loads(urllib.request.urlopen(url, timeout=30).read())
    assert before["status"] == "ok"
    post_npy(f"http://127.0.0.1:{served.port}/infer", _batch(2, seed=5))
    after = json.loads(urllib.request.urlopen(url, timeout=30).read())
    assert after["requests"] == before["requests"] + 1
    assert after["frames"] == before["frames"] + 2 * CLIP_LEN
    assert after["last_latency_ms"] > 0
    # latency decomposes into lock-wait + device time; nothing inflight.
    assert after["last_latency_ms"] == pytest.approx(
        after["last_queue_ms"] + after["last_infer_ms"]
    )
    assert after["inflight"] == 0
    assert after["meta"]["meta"]["model"] == "hybrid"


def test_malformed_and_wrong_requests_do_not_kill_server(served):
    base = f"http://127.0.0.1:{served.port}"
    # Garbage body -> 400 with a JSON error.
    req = urllib.request.Request(
        f"{base}/infer", data=b"not an npy", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # Wrong path -> 404.
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nope", timeout=30)
    assert e.value.code == 404
    # Server still serves.
    out = post_npy(f"{base}/infer", _batch(1, seed=6))
    assert out.ndim == 5


def test_metaless_float_artifact_warms_and_validates(tmp_path):
    """Warmup derives input shape/dtype from the exported batch aval, so
    it works without meta and for float-input programs; bad buckets are
    rejected before any warmup work (round-3 review findings)."""
    def fn(w, x):
        return x * w["s"]

    exported, w = export_lib.export_serving(
        fn, {"s": np.float32(2.0)}, jnp.zeros((1, 6), jnp.float32)
    )
    path = str(tmp_path / "tiny.tchvp")
    export_lib.save_artifact(path, exported, w)  # no meta at all
    model = export_lib.load_artifact(path)
    probe = model.example_input(3)
    assert probe.shape == (3, 6) and probe.dtype == np.float32

    with pytest.raises(ValueError, match="buckets"):
        serve_artifact(path, buckets=(0, 2))

    srv = serve_artifact(path, port=0, buckets=(2,)).start()
    try:
        out = post_npy(f"http://127.0.0.1:{srv.port}/infer",
                       np.ones((1, 6), np.float32))
        np.testing.assert_allclose(out, 2.0)
    finally:
        srv.shutdown()


def test_server_faults_read_as_500_client_errors_as_400():
    """Monitoring must distinguish 'your batch is wrong' (400) from
    'the accelerator/daemon is broken' (500)."""
    import io as _io

    from tchvp_tpu.infer.server import ArtifactServer

    class Stub:
        platforms = ("cpu",)
        meta = {}
        calls = 0

        def __call__(self, batch):
            Stub.calls += 1
            if Stub.calls == 1:
                raise ValueError("rank mismatch for program")
            raise RuntimeError("device lost")

    srv = ArtifactServer(Stub(), port=0, buckets=None).start()
    try:
        buf = _io.BytesIO()
        np.save(buf, np.ones((1, 2), np.float32), allow_pickle=False)

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/infer",
                data=buf.getvalue(), method="POST",
            )
            return urllib.request.urlopen(req, timeout=30)

        with pytest.raises(urllib.error.HTTPError) as e:
            post()
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            post()
        assert e.value.code == 500
    finally:
        srv.shutdown()


def test_data_parallel_model_matches_single_device(artifact_path):
    """over_mesh(): matches the one-device program (up to XLA's
    batch-shape-dependent float reassociation), shard_map marker
    attested, and the output REALLY lives sharded over all 8 devices
    (round-2 lesson: prove placement, not just math)."""
    from tchvp_tpu.infer.export import load_artifact
    from tchvp_tpu.ops import dispatch_trace

    base = load_artifact(artifact_path)
    batch = _batch(8, seed=21)
    want = np.asarray(base(batch), np.float32)

    dp = base.over_mesh()  # all 8 virtual devices
    assert dp.n_devices == len(jax.devices())
    with dispatch_trace.capture() as markers:
        out = dp(batch)
    assert "serving_dp_shard_map" in markers
    assert len(out.sharding.device_set) == dp.n_devices
    shard = out.addressable_shards[0].data
    assert shard.shape[0] == batch.shape[0] // dp.n_devices
    # The per-device program compiles at batch B/N (vs B): same math,
    # different schedules -> float-level differences only.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), want, atol=1e-6, rtol=1e-5
    )

    with pytest.raises(ValueError, match="batch %"):
        dp(_batch(3))


def test_data_parallel_server_end_to_end(artifact_path):
    """serve_artifact(data_parallel=True): default bucket auto-scales to
    one row per device, sub-mesh batches pad soundly over HTTP."""
    srv = serve_artifact(artifact_path, port=0, data_parallel=True)
    assert srv.buckets == (len(jax.devices()),)
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}/infer"
        batch = _batch(3, seed=33)  # pads 3 -> 8 across the mesh
        got = post_npy(url, batch)
        # Only the real rows come back, identical to the padded run's.
        assert got.shape[0] == 3
        dp_full = np.asarray(
            srv.model(np.concatenate(
                [batch, np.zeros((5,) + batch.shape[1:], batch.dtype)]
            )), np.float32,
        )
        np.testing.assert_allclose(got, dp_full[:3], atol=0)
    finally:
        srv.shutdown()


def test_data_parallel_rejects_indivisible_buckets(artifact_path):
    with pytest.raises(ValueError, match="multiples of"):
        serve_artifact(
            artifact_path, port=0, data_parallel=True, buckets=(4,),
            warmup=False,
        )


def test_dynamic_microbatching_coalesces_and_matches(artifact_path):
    """batch_window_ms > 0: concurrent batch-1 requests coalesce into one
    device batch (health shows coalesced_*), and every client gets
    exactly the rows it would have gotten alone."""
    import threading

    srv = serve_artifact(
        artifact_path, port=0, buckets=(1, 4), batch_window_ms=150.0
    )
    srv.start()
    try:
        url = f"http://{srv.address[0]}:{srv.port}"
        n = 4
        batches = [_batch(1, seed=10 + i) for i in range(n)]
        want = [np.asarray(srv.model(b)) for b in batches]

        outs = [None] * n
        barrier = threading.Barrier(n)

        def post(i):
            barrier.wait()
            outs[i] = post_npy(f"{url}/infer", batches[i])

        threads = [threading.Thread(target=post, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i in range(n):
            np.testing.assert_allclose(
                outs[i], want[i].astype(np.float32), rtol=1e-5, atol=1e-5
            )
        health = json.loads(
            urllib.request.urlopen(f"{url}/health").read()
        )
        assert health["requests"] == n
        assert health["coalesced_calls"] >= 1
        assert health["coalesced_requests"] >= 2
        # Coalescing must produce FEWER device calls than requests.
        assert health["coalesced_calls"] < health["coalesced_requests"]
    finally:
        srv.shutdown()


def test_microbatcher_lone_request_not_starved(artifact_path):
    """Starvation regression (round-3 verdict item 7): a LONE request
    under an open micro-batch window must flush at window expiry — it
    cannot wait for peers that never arrive. Bound: window + a modest
    scheduling/compute allowance, far below any multi-window stall."""
    import time

    window_ms = 200.0
    srv = serve_artifact(
        artifact_path, port=0, buckets=(1, 2), batch_window_ms=window_ms
    )
    srv.start()
    try:
        url = f"http://{srv.address[0]}:{srv.port}"
        batch = _batch(1, seed=42)
        post_npy(f"{url}/infer", batch)  # warm (compile outside timing)
        t0 = time.perf_counter()
        out = post_npy(f"{url}/infer", batch)
        dt_ms = 1000 * (time.perf_counter() - t0)
        assert out.shape[0] == 1
        # One window of coalescing wait is the price of admission; two
        # windows would mean the flush timer lost the lone request.
        infer_ms = json.loads(
            urllib.request.urlopen(f"{url}/health").read()
        )["last_infer_ms"]
        assert dt_ms < 2 * window_ms + max(10 * infer_ms, 500.0), (
            f"lone request took {dt_ms:.0f}ms under a {window_ms}ms window"
        )
    finally:
        srv.shutdown()


def test_microbatcher_isolates_bad_shapes(artifact_path):
    """A client whose clip shape mismatches fails alone — requests with
    the right shape in the same window still succeed (group-by-shape)."""
    import threading

    srv = serve_artifact(
        artifact_path, port=0, buckets=(1, 4), batch_window_ms=150.0
    )
    srv.start()
    try:
        url = f"http://{srv.address[0]}:{srv.port}"
        good = _batch(1, seed=3)
        bad = np.zeros((1, CLIP_LEN, SIZE // 2, SIZE, 3), np.uint8)
        results = {}
        barrier = threading.Barrier(2)

        def post(name, arr):
            barrier.wait()
            try:
                results[name] = post_npy(f"{url}/infer", arr)
            except Exception as e:  # noqa: BLE001
                results[name] = e

        ts = [threading.Thread(target=post, args=("good", good)),
              threading.Thread(target=post, args=("bad", bad))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert isinstance(results["bad"], Exception)
        assert isinstance(results["good"], np.ndarray)
        np.testing.assert_allclose(
            results["good"],
            np.asarray(srv.model(good)).astype(np.float32),
            rtol=1e-5, atol=1e-5,
        )
    finally:
        srv.shutdown()


def test_streaming_sessions_end_to_end(tmp_path):
    """Streaming artifact behind the daemon: open a session, POST chunks
    (carry threaded server-side), results match direct step() calls;
    close frees it; /infer redirects; health counts live streams."""
    from tchvp_tpu.infer.export import (
        export_streaming_step,
        load_artifact,
        save_artifact,
        streaming_meta,
    )

    chunk_len, ctx = 2, 1
    cfg = flagship_video_config(image_size=SIZE)
    model = VideoHybridNet(config=cfg)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, chunk_len, SIZE, SIZE, 3))
    )
    exported, w = export_streaming_step(
        model, vs, chunk_len=chunk_len, ctx_frames=ctx, image_size=SIZE
    )
    path = str(tmp_path / "s.tchvp")
    save_artifact(path, exported, w, meta=streaming_meta(
        chunk_len=chunk_len, ctx_frames=ctx, image_size=SIZE, batch=1,
        tokens_per_frame=cfg.tokens_per_frame,
    ))

    srv = serve_artifact(path, port=0)
    srv.start()
    try:
        url = f"http://{srv.address[0]}:{srv.port}"
        opened = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{url}/stream/open", method="POST"),
        ).read())
        sid = opened["session"]
        assert opened["chunk_len"] == chunk_len

        clip = np.random.default_rng(1).integers(
            0, 255, (1, 4, SIZE, SIZE, 3), dtype=np.uint8
        )
        ref = load_artifact(path)
        carry = ref.init_carry()
        outs = []
        for start in range(0, 4, chunk_len):
            chunk = clip[:, start:start + chunk_len]
            got = post_npy(f"{url}/stream/{sid}", chunk)
            carry, want = ref.step(carry, chunk)
            np.testing.assert_allclose(
                got, np.asarray(want).astype(np.float32),
                rtol=1e-5, atol=1e-5,
            )
            outs.append(got)

        health = json.loads(urllib.request.urlopen(f"{url}/health").read())
        assert health["streams"] == 1
        assert health["requests"] == 2

        # /infer on a streaming server redirects the client.
        with pytest.raises(urllib.error.HTTPError) as e:
            post_npy(f"{url}/infer", clip)
        assert e.value.code == 400

        closed = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{url}/stream/{sid}/close", method="POST"),
        ).read())
        assert closed["closed"] is True
        with pytest.raises(urllib.error.HTTPError) as e:
            post_npy(f"{url}/stream/{sid}", clip[:, :chunk_len])
        assert e.value.code == 404
    finally:
        srv.shutdown()


def test_cli_stream_url_client(tmp_path, capsys):
    """`tchvp stream --url` drives a remote streaming session end to end
    (open -> chunked posts -> close) and reports throughput."""
    from tchvp_tpu.cli import main
    from tchvp_tpu.infer.export import (
        export_streaming_step,
        save_artifact,
        streaming_meta,
    )

    chunk_len, ctx = 2, 1
    cfg = flagship_video_config(image_size=SIZE)
    model = VideoHybridNet(config=cfg)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, chunk_len, SIZE, SIZE, 3))
    )
    exported, w = export_streaming_step(
        model, vs, chunk_len=chunk_len, ctx_frames=ctx, image_size=SIZE
    )
    path = str(tmp_path / "c.tchvp")
    save_artifact(path, exported, w, meta=streaming_meta(
        chunk_len=chunk_len, ctx_frames=ctx, image_size=SIZE, batch=1,
        tokens_per_frame=cfg.tokens_per_frame,
    ))
    srv = serve_artifact(path, port=0)
    srv.start()
    try:
        url = f"http://{srv.address[0]}:{srv.port}"
        main([
            "stream", "--url", url, "--synthetic", "1", "--batch-size", "1",
            "--clip-len", "4", "--height", str(SIZE), "--width", str(SIZE),
        ])
        out = capsys.readouterr().out
        assert "stream session" in out
        assert "streamed 4 frames" in out
        # The session was closed by the client.
        health = json.loads(urllib.request.urlopen(f"{url}/health").read())
        assert health["streams"] == 0 and health["requests"] == 2
    finally:
        srv.shutdown()


@pytest.mark.slow  # ~2 min: compiles the pipelined program at 2 buckets
def test_live_pipelined_serving_matches_infer_path():
    """`tchvp serve --mesh data=2,pipe=2` (round-4 verdict #5): the LIVE
    pipelined server's output must BITWISE match the one-shot
    `tchvp infer --mesh pipe=N` computation (uint8 -> preprocess bf16 ->
    pipelined_video_infer -> f32 wire), /health must report the mesh,
    and buckets must pad/split like artifact serving."""
    from tchvp_tpu.data.pipeline import preprocess_clip
    from tchvp_tpu.infer.server import serve_live_pipelined
    from tchvp_tpu.parallel import make_mesh, pipelined_video_infer

    cfg = flagship_video_config(image_size=SIZE, num_layers=2)
    model = VideoHybridNet(config=cfg)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP_LEN, SIZE, SIZE, 3))
    )
    mesh = make_mesh(("data", "pipe"), (2, 2), jax.devices()[:4])
    srv = serve_live_pipelined(
        model, vs, mesh, axis="pipe", batch_axis="data",
        image_size=SIZE, clip_len=CLIP_LEN, port=0, buckets=(2, 4),
    ).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        health = json.loads(
            urllib.request.urlopen(f"{base}/health", timeout=60).read()
        )
        assert health["meta"]["kind"] == "live_pipelined"
        assert health["meta"]["mesh"] == {"data": 2, "pipe": 2}

        batch = _batch(4, seed=7)
        served = post_npy(f"{base}/infer", batch)

        # The `tchvp infer --mesh pipe=N` computation, independently.
        from jax.sharding import NamedSharding, PartitionSpec

        raw = jax.device_put(
            jnp.asarray(batch),
            NamedSharding(mesh, PartitionSpec("data", None, None, None, None)),
        )

        @jax.jit
        def run(v, raw):
            clip = preprocess_clip(raw, SIZE, dtype=jnp.bfloat16)
            _, recon = pipelined_video_infer(
                model, v, clip, mesh=mesh, axis="pipe", batch_axis="data"
            )
            return recon

        want = np.asarray(run(vs, raw)).astype(np.float32)
        np.testing.assert_array_equal(served, want)

        # Bucket padding: batch 1 pads to bucket 2, rows sliced back.
        one = post_npy(f"{base}/infer", batch[:1])
        np.testing.assert_array_equal(one, want[:1])
    finally:
        srv.shutdown()

    # Bucket validation: with a 2-wide data axis, odd buckets reject.
    with pytest.raises(ValueError, match="multiples of 2"):
        serve_live_pipelined(
            model, vs, mesh, axis="pipe", batch_axis="data",
            image_size=SIZE, clip_len=CLIP_LEN, buckets=(3,), warmup=False,
        )


def test_serve_cli_pipelined_flag_validation():
    """cmd_serve's live-pp mode rejects the invalid compositions with
    clear errors BEFORE any model work."""
    from tchvp_tpu import cli

    with pytest.raises(SystemExit, match="don't compose"):
        cli.main([
            "serve", "--mesh", "data=4,pipe=2", "--exported", "x.tchvp",
        ])
    with pytest.raises(SystemExit, match="multiple of pipe"):
        cli.main([
            "serve", "--mesh", "data=4,pipe=2", "--layers", "3",
        ])
    with pytest.raises(SystemExit, match="data=K,pipe=N"):
        cli.main(["serve", "--mesh", "data=8"])
    with pytest.raises(SystemExit, match="provide --exported"):
        cli.main(["serve"])
