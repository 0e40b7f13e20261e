"""Utility coverage: profiling timer, model summaries, Sobel edges,
image artifact dumps."""

import time

import jax.numpy as jnp
import numpy as np
import pytest


def test_step_timer_skips_compile_and_reports():
    from tchvp_tpu.utils.profiling import StepTimer

    t = StepTimer(skip=1)
    for i in range(4):
        with t.step():
            time.sleep(0.01)
    s = t.summary(items_per_step=8)
    assert s["steps"] == 3  # first skipped
    assert s["p50_s"] >= 0.009
    assert s["items_per_s"] > 0
    t.reset()
    assert t.summary() == {"steps": 0}


def test_describe_and_count_params():
    from tchvp_tpu.models import UNet
    from tchvp_tpu.utils.summary import count_params, describe

    x = jnp.zeros((1, 32, 32, 3))
    n = count_params(UNet(), x)
    assert n == 7_763_041  # reference UNet size (~7.8M, survey #11)
    assert "7.76M" in describe(UNet(), x)


def test_summarize_table_and_cli_summary(capsys):
    """`tchvp summary` = the reference's torchsummary workflow
    (FCT.py:4,262): per-layer table + totals, straight from the CLI."""
    from tchvp_tpu.cli import main
    from tchvp_tpu.models import UNet
    from tchvp_tpu.utils.summary import summarize

    x = jnp.zeros((1, 32, 32, 3))
    table = summarize(UNet(), x)
    assert "UNet" in table and "7,763,041" in table
    # depth=1 collapses nested blocks: strictly fewer rows.
    assert len(summarize(UNet(), x, depth=1).splitlines()) < len(table.splitlines())

    main(["summary", "--model", "unet", "--image-size", "32", "--depth", "1"])
    out = capsys.readouterr().out
    assert "7,763,041" in out and "UNet: 7.76M parameters" in out
    assert "Input: (1, 32, 32, 3)" in out


def test_sobel_edges_detects_step():
    from tchvp_tpu.ops.sobel import sobel_edges

    img = np.zeros((1, 16, 16, 1), np.float32)
    img[:, :, 8:, :] = 1.0  # vertical step
    edges = np.asarray(sobel_edges(jnp.asarray(img)))
    assert edges[0, 4, 8, 0] > 0.5  # strong response at the edge
    assert edges[0, 4, 2, 0] < 1e-3  # flat region quiet


def test_save_side_by_side_and_triplet(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    from tchvp_tpu.utils.imaging import save_sample_triplet, save_side_by_side

    a = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
    out = tmp_path / "sbs.jpg"
    save_side_by_side([a, a], str(out))
    img = PIL.open(out)
    assert img.size == (16, 8)  # two 8x8 panels side by side

    save_sample_triplet(str(tmp_path / "trip"), 3, a[None], a[None], a[None])
    files = list((tmp_path / "trip").iterdir())
    assert len(files) == 3  # input / target / prediction dumps


def test_sobel_edges_flat_mask_is_zero_not_nan():
    """Degenerate all-flat input: the reference's host Sobel divides by
    np.max(...) == 0 and produces NaNs (FCT.py:401); ours pins the safe
    behavior — zero edges, finite everywhere (VERDICT r2 missing #3)."""
    from tchvp_tpu.ops.sobel import sobel_edges

    flat = jnp.zeros((1, 16, 16, 1), jnp.float32)
    edges = np.asarray(sobel_edges(flat))
    assert np.isfinite(edges).all()
    np.testing.assert_array_equal(edges, np.zeros_like(edges))
    # Nonzero constant too (gradient is zero, max is zero).
    edges2 = np.asarray(sobel_edges(flat + 0.7))
    assert np.isfinite(edges2).all()
    np.testing.assert_array_equal(edges2, np.zeros_like(edges2))


def test_read_manifest_explicit_header(tmp_path):
    """header= overrides the auto-heuristic for the cases it misreads:
    a deleted first file, or extensionless paths (VERDICT r2 weak #5)."""
    from tchvp_tpu.data.manifest import read_manifest

    # Extensionless data paths that do not exist: heuristic would treat
    # the first DATA row as a header and silently drop it.
    m = tmp_path / "noext.csv"
    m.write_text("/data/frames/clip_000\n/data/frames/clip_001\n")
    assert len(read_manifest(str(m), header=False)) == 2
    assert len(read_manifest(str(m))) == 1  # the documented misfire

    # Real header + existing files: all three agree.
    imgs = []
    for i in range(2):
        p = tmp_path / f"img{i}.jpg"
        p.write_bytes(b"x")
        imgs.append(str(p))
    m2 = tmp_path / "hdr.csv"
    m2.write_text("path\n" + "\n".join(imgs) + "\n")
    assert read_manifest(str(m2)) == [[p] for p in imgs]
    assert read_manifest(str(m2), header=True) == [[p] for p in imgs]
    # header=False keeps the header row (caller asked for raw rows).
    assert read_manifest(str(m2), header=False)[0] == ["path"]


def test_manifest_dataset_position_seek(tmp_path):
    """CSV-backed datasets are positionable like ClipPackDataset: seek
    replays epoch shuffles of a fresh rng (one per epoch started), and
    position() counts CONSUMER-side so a prefetch queue running ahead
    does not inflate the checkpointable position."""
    PIL = pytest.importorskip("PIL.Image")
    from tchvp_tpu.data.manifest import ImageDataset

    paths = []
    for i in range(12):
        p = tmp_path / f"im{i}.png"
        PIL.fromarray(np.full((4, 4, 3), i, np.uint8)).save(p)
        paths.append(str(p))
    csv = tmp_path / "m.csv"
    csv.write_text("\n".join(paths) + "\n")

    def mk(**kw):
        return ImageDataset(str(csv), batch_size=4, image_size=4, seed=5, **kw)

    oracle = mk()
    stream = list(oracle) + list(oracle) + list(oracle)  # epochs 0-2, 3 b/ep

    # Seek into the middle of epoch 1: remainder + epoch 2, byte-exact.
    ds = mk()
    ds.seek(1, 1)
    assert ds.position() == {"epoch": 1, "batch": 1}
    got = list(ds) + list(ds)
    want = stream[4:9]
    assert len(got) == len(want) == 5
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    assert ds.position() == {"epoch": 3, "batch": 0}

    # Abandoned mid-epoch -> next iteration serves the NEXT epoch
    # (clippack semantics; also the pre-existing behavior here).
    ab = mk()
    for i, _ in enumerate(ab):
        if i == 0:
            break
    for a, b in zip(ab, stream[3:6]):
        np.testing.assert_array_equal(a, b)

    # Prefetch: the decode worker runs ahead, position() must not.
    pf = mk(prefetch=True)
    it = iter(pf)
    next(it)
    next(it)
    assert pf.position() == {"epoch": 0, "batch": 2}
    for a, b in zip([next(it)], [stream[2]]):
        np.testing.assert_array_equal(a, b)

    # seek() is history-free: epoch permutations are pure functions of
    # (seed, epoch), so a zero-consumed abandoned iterator (prefetch
    # worker shuffled eagerly, consumer crashed before batch 0) cannot
    # desynchronize what a restored process reconstructs.
    messy = mk(prefetch=True)
    for _ in range(3):
        iter(messy._gen()).__next__()  # start+abandon generators
    messy.seek(1, 1)
    for a, b in zip(messy, stream[4:6]):
        np.testing.assert_array_equal(a, b)
