"""ClipPack format + native threaded loader (build-new host runtime).

Covers: pack/read roundtrip, native vs NumPy-fallback batch parity
(bit-exact shuffles), multi-epoch coverage (every clip exactly once per
epoch), determinism across loader instances, and corrupt-file rejection.
"""

import numpy as np
import pytest

from tchvp_tpu.data import clippack


def _make_pack(tmp_path, n=12, t=2, h=4, w=6, c=3, seed=0):
    rng = np.random.default_rng(seed)
    clips = rng.integers(0, 256, (n, t, h, w, c), dtype=np.uint8)
    path = str(tmp_path / "clips.cpk")
    clippack.pack_clips(path, clips)
    return path, clips


def test_pack_and_sequential_read(tmp_path):
    path, clips = _make_pack(tmp_path)
    ds = clippack.ClipPackDataset(path, batch_size=4, shuffle=False,
                                  prefer_native=False)
    assert ds.clip_shape == clips.shape[1:]
    got = np.concatenate(list(ds))
    np.testing.assert_array_equal(got, clips)


def test_native_builds_and_loads(tmp_path):
    assert clippack.native_available(), "g++ toolchain should build the lib"
    path, clips = _make_pack(tmp_path)
    ds = clippack.ClipPackDataset(path, batch_size=3, shuffle=False)
    assert ds._native
    got = np.concatenate(list(ds))
    np.testing.assert_array_equal(got, clips)
    ds.close()


@pytest.mark.skipif(not clippack.native_available(), reason="no toolchain")
def test_native_matches_fallback_shuffled(tmp_path):
    """The C++ mt19937_64 Fisher-Yates and the Python replica must produce
    identical batches — native is a drop-in speedup, not a new ordering."""
    path, _ = _make_pack(tmp_path, n=17)
    nat = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=7)
    ref = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=7,
                                   prefer_native=False)
    assert nat._native and not ref._native
    for epoch in range(3):
        for a, b in zip(nat, ref):
            np.testing.assert_array_equal(a, b)
    nat.close()


@pytest.mark.skipif(not clippack.native_available(), reason="no toolchain")
def test_abandoned_iterator_starts_fresh_epoch(tmp_path):
    """Breaking out of an epoch mid-way must not leak leftover batches into
    the next iteration: both paths start the NEXT epoch (ADVICE r1)."""
    path, _ = _make_pack(tmp_path, n=16)
    nat = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=5)
    ref = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=5,
                                   prefer_native=False)
    assert nat._native and not ref._native
    for ds in (nat, ref):
        for i, _ in enumerate(ds):
            if i == 1:  # abandon after 2 of 4 batches
                break
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)
    # And the epoch after an abandoned one still matches a clean reference
    # stream two epochs in.
    clean = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=5,
                                     prefer_native=False)
    list(clean), list(clean)  # consume epochs 0 and 1
    for a, b in zip(nat, clean):
        np.testing.assert_array_equal(a, b)
    nat.close()


def test_epoch_covers_all_clips_once(tmp_path):
    path, clips = _make_pack(tmp_path, n=16)
    ds = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=3)
    seen = np.concatenate(list(ds))
    # Sort both by bytes to compare as multisets.
    key = lambda arr: sorted(x.tobytes() for x in arr)  # noqa: E731
    assert key(seen) == key(clips)
    # Second epoch: same multiset, different order.
    seen2 = np.concatenate(list(ds))
    assert key(seen2) == key(clips)
    assert any(
        x.tobytes() != y.tobytes() for x, y in zip(seen, seen2)
    ), "epochs should reshuffle"
    ds.close()


def test_deterministic_across_instances(tmp_path):
    path, _ = _make_pack(tmp_path, n=10)
    mk = lambda: clippack.ClipPackDataset(  # noqa: E731
        path, batch_size=2, shuffle=True, seed=5
    )
    a, b = mk(), mk()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    a.close(); b.close()


def test_drop_last(tmp_path):
    path, _ = _make_pack(tmp_path, n=10)
    ds = clippack.ClipPackDataset(path, batch_size=4, prefer_native=False)
    assert len(ds) == 2
    assert sum(1 for _ in ds) == 2


def test_rejects_corrupt_file(tmp_path):
    bad = tmp_path / "bad.cpk"
    bad.write_bytes(b"not a clippack file at all" * 4)
    with pytest.raises(OSError):
        clippack.ClipPackDataset(str(bad), batch_size=1, prefer_native=False)
    if clippack.native_available():
        with pytest.raises(OSError):
            clippack.ClipPackDataset(str(bad), batch_size=1)


def test_rejects_lying_header(tmp_path):
    """A header whose dims overflow n*t*h*w*c past 2^64 must be rejected,
    not spuriously pass the size check and turn clip reads into
    out-of-bounds mmap accesses (overflow-checked validation in
    clippack_open)."""
    path, _ = _make_pack(tmp_path, n=4)
    hdr = np.fromfile(path, dtype="<i8", count=8)  # _HEADER_INTS
    body = open(path, "rb").read()
    for n, t in [(1 << 62, 1 << 62), (hdr[2], 1 << 61)]:
        evil = hdr.copy()
        evil[2], evil[3] = n, t  # n_clips, frames
        bad = tmp_path / "evil.cpk"
        bad.write_bytes(evil.tobytes() + body[evil.nbytes:])
        with pytest.raises((OSError, ValueError)):
            clippack.ClipPackDataset(str(bad), batch_size=1,
                                     prefer_native=False)
        if clippack.native_available():
            with pytest.raises((OSError, ValueError)):
                clippack.ClipPackDataset(str(bad), batch_size=1)


def test_pack_from_manifest_roundtrip(tmp_path):
    """CSV manifest of frame images -> clippack -> batches."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(1)
    rows = []
    for clip_i in range(3):
        paths = []
        for frame_i in range(2):
            img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            p = tmp_path / f"c{clip_i}_f{frame_i}.png"
            PIL.fromarray(img).save(p)
            paths.append(str(p))
        rows.append(",".join(paths))
    csv_file = tmp_path / "clips.csv"
    csv_file.write_text("\n".join(rows) + "\n")

    out = str(tmp_path / "packed.cpk")
    n, t = clippack.pack_from_manifest(str(csv_file), out, image_size=8)
    assert (n, t) == (3, 2)
    ds = clippack.ClipPackDataset(out, batch_size=1, shuffle=False,
                                  prefer_native=False)
    batches = list(ds)
    assert len(batches) == 3 and batches[0].shape == (1, 2, 8, 8, 3)


def test_sharded_loaders_concatenate_to_unsharded(tmp_path):
    """Multi-host input sharding: hosts share the epoch permutation and
    take contiguous slices, so shard batches concatenate to exactly the
    single-host global batch — native and fallback paths alike."""
    path, _ = _make_pack(tmp_path, n=24)
    for native in (False, True):
        if native and not clippack.native_available():
            continue
        whole = clippack.ClipPackDataset(
            path, batch_size=8, seed=11, prefer_native=native
        )
        shards = [
            clippack.ClipPackDataset(
                path, batch_size=4, seed=11, prefer_native=native,
                shard_id=i, num_shards=2,
            )
            for i in range(2)
        ]
        assert len(whole) == len(shards[0]) == 3
        for b_whole, b0, b1 in zip(whole, *shards):
            np.testing.assert_array_equal(np.concatenate([b0, b1]), b_whole)
        for ds in shards:
            ds.close()
        whole.close()


def test_global_batch_loader_over_mesh(tmp_path):
    """GlobalBatchLoader assembles per-host batches into mesh-sharded
    global jax.Arrays (single-process here: local == global)."""
    import jax

    from tchvp_tpu.parallel import make_mesh, sharded_clippack_loader

    path, clips = _make_pack(tmp_path, n=16)
    mesh = make_mesh(("data",))
    loader = sharded_clippack_loader(path, global_batch=8, mesh=mesh, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].shape == (8,) + clips.shape[1:]
    assert batches[0].sharding.spec == jax.sharding.PartitionSpec(
        "data", None, None, None, None
    )
    got = np.concatenate([np.asarray(b) for b in batches])
    np.testing.assert_array_equal(got, clips)


def test_write_manifest_roundtrip(tmp_path):
    """generateDataset.py equivalent: walk image dirs -> CSV -> loader,
    without the reference's header-row-as-path bug."""
    PIL = pytest.importorskip("PIL.Image")
    from tchvp_tpu.data.manifest import (
        ImageDataset,
        read_manifest,
        write_clip_manifest,
        write_manifest,
    )

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):
        PIL.fromarray(
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        ).save(img_dir / f"{i}.png")
    (img_dir / "notes.txt").write_text("not an image")

    out = str(tmp_path / "m.csv")
    assert write_manifest(str(img_dir), out) == 5
    assert len(read_manifest(out)) == 5
    ds = ImageDataset(out, batch_size=5, image_size=8, shuffle=False)
    (batch,) = list(ds)
    assert batch.shape == (5, 8, 8, 3)

    # Clip manifest: two frame dirs, one too short for clip_len.
    d1, d2 = tmp_path / "clip1", tmp_path / "clip2"
    for d, nf in ((d1, 3), (d2, 1)):
        d.mkdir()
        for i in range(nf):
            PIL.fromarray(
                rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            ).save(d / f"f{i}.png")
    out2 = str(tmp_path / "clips.csv")
    assert write_clip_manifest([str(d1), str(d2)], out2, clip_len=2) == 1
    rows = read_manifest(out2)
    assert len(rows) == 1 and len(rows[0]) == 2


def test_manifest_fast_ingest(tmp_path):
    """The reworked CSV ingest (thread-pool decode, RAM cache, optional
    prefetch) must be a pure speedup: identical batches across cache
    cold/warm epochs, prefetch on/off, and ragged input sizes."""
    PIL = pytest.importorskip("PIL.Image")
    from tchvp_tpu.data import manifest as M

    rng = np.random.default_rng(3)
    paths = []
    for i, s in enumerate([12, 20, 12, 12]):  # one ragged frame
        p = tmp_path / f"f{i}.png"
        PIL.fromarray(rng.integers(0, 256, (s, s, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
        m = tmp_path / f"m{i}.png"
        PIL.fromarray(rng.integers(0, 256, (s, s), dtype=np.uint8)).save(m)

    img_csv = tmp_path / "imgs.csv"
    img_csv.write_text("\n".join(paths) + "\n")
    pair_csv = tmp_path / "pairs.csv"
    pair_csv.write_text(
        "\n".join(f"{p},{tmp_path}/m{i}.png" for i, p in enumerate(paths)) + "\n"
    )
    clip_csv = tmp_path / "clips.csv"
    clip_csv.write_text("\n".join(",".join(paths[:3]) for _ in range(2)) + "\n")

    ds = M.ImageDataset(str(img_csv), 2, image_size=12, shuffle=False)
    cold = [b.copy() for b in ds]  # epoch 1 decodes, epoch 2 hits cache
    warm = list(ds)
    assert len(cold) == 2 and cold[0].shape == (2, 12, 12, 3)
    for a, b in zip(cold, warm):
        np.testing.assert_array_equal(a, b)

    pf = M.ImageDataset(str(img_csv), 2, image_size=12, shuffle=False,
                        prefetch=True)
    for a, b in zip(cold, pf):
        np.testing.assert_array_equal(a, b)

    dsm = M.ImageMaskDataset(str(pair_csv), 2, image_size=12, shuffle=False)
    img, mask = next(iter(dsm))
    assert img.shape == (2, 12, 12, 3) and mask.shape == (2, 12, 12, 1)

    dsc = M.ClipDataset(str(clip_csv), 2, image_size=12, shuffle=False)
    (clips,) = list(dsc)
    assert clips.shape == (2, 3, 12, 12, 3)
    # per-frame content matches a direct decode+resize
    for t, p in enumerate(paths[:3]):
        with PIL.open(p) as im:
            want = np.asarray(
                im.convert("RGB").resize((12, 12), PIL.BILINEAR), dtype=np.uint8
            ) if im.size != (12, 12) else np.asarray(im.convert("RGB"))
        np.testing.assert_array_equal(clips[0, t], want)


def test_prefetcher_propagates_errors_and_releases_worker():
    """A decode error mid-epoch must abort the iteration (not silently
    truncate it), and abandoning a prefetching iterator must release the
    worker thread."""
    import threading
    import time

    from tchvp_tpu.data.manifest import _Prefetcher

    def boom():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for x in _Prefetcher(boom, depth=1):
            got.append(x)
    assert got == [1, 2]

    # Abandonment: worker must not stay blocked on the full queue.
    before = {t.ident for t in threading.enumerate()}

    def endless():
        i = 0
        while True:
            yield i
            i += 1

    it = iter(_Prefetcher(endless, depth=1))
    assert next(it) == 0
    it.close()  # GeneratorExit -> finally -> stop + join
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        extra = {t.ident for t in threading.enumerate()} - before
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, "prefetch worker thread leaked after abandonment"


# ---- mid-epoch position/seek (preemption-tolerant resume) ----


def _paths(tmp_path, n=16, seed=9):
    path, _ = _make_pack(tmp_path, n=n, seed=seed)
    return path


@pytest.mark.parametrize("native", [False, True])
def test_position_tracks_mid_iteration(tmp_path, native):
    if native and not clippack.native_available():
        pytest.skip("no toolchain")
    path = _paths(tmp_path)
    ds = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=3,
                                  prefer_native=native)
    assert ds.position() == {"epoch": 0, "batch": 0}
    it = iter(ds)
    next(it), next(it)
    assert ds.position() == {"epoch": 0, "batch": 2}
    for _ in it:
        pass
    assert ds.position() == {"epoch": 1, "batch": 0}
    ds.close()


@pytest.mark.parametrize("native", [False, True])
def test_seek_resumes_exact_stream(tmp_path, native):
    """Preemption replay: a FRESH dataset seeked to a saved position must
    serve byte-for-byte the batches an uninterrupted stream would have —
    the remainder of the target epoch, then the following epochs."""
    if native and not clippack.native_available():
        pytest.skip("no toolchain")
    path = _paths(tmp_path)
    oracle = clippack.ClipPackDataset(path, batch_size=4, shuffle=True,
                                      seed=11, prefer_native=False)
    stream = list(oracle) + list(oracle) + list(oracle)  # epochs 0-2

    # "Preempted" after 2 batches of epoch 1 (stream index 4+2).
    ds = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=11,
                                  prefer_native=native)
    ds.seek(1, 2)
    assert ds.position() == {"epoch": 1, "batch": 2}
    got = list(ds) + list(ds)  # rest of epoch 1, then epoch 2
    want = stream[6:12]
    assert len(got) == len(want) == 6
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    assert ds.position() == {"epoch": 3, "batch": 0}
    ds.close()


@pytest.mark.skipif(not clippack.native_available(), reason="no toolchain")
def test_seek_native_matches_fallback(tmp_path):
    path = _paths(tmp_path, n=20)
    nat = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=2)
    ref = clippack.ClipPackDataset(path, batch_size=4, shuffle=True, seed=2,
                                   prefer_native=False)
    assert nat._native and not ref._native
    for ds in (nat, ref):
        ds.seek(2, 3)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)
    nat.close()


def test_seek_validates_range(tmp_path):
    path = _paths(tmp_path)
    ds = clippack.ClipPackDataset(path, batch_size=4, prefer_native=False)
    with pytest.raises(ValueError):
        ds.seek(0, 99)
    with pytest.raises(ValueError):
        ds.seek(-1, 0)
