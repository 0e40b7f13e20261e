"""Persistent kernel autotuner (tchvp_tpu/kernels/autotune.py).

The cache must round-trip, the trace-time resolvers must honor the
precedence explicit-arg > tuned-entry > shipped-default, the kernel
entry points must actually consult the cache (wiring proof via a real
lookup, not numeric equality), and the tuner must run end-to-end on CPU
(interpret kernels) and persist a winner another process would read.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tchvp_tpu.kernels import autotune, flash_attention as fa


@pytest.fixture
def tuned_cache(tmp_path, monkeypatch):
    """Point the autotuner at a fresh per-test cache file."""
    path = str(tmp_path / "autotune.json")
    monkeypatch.setenv("TCHVP_AUTOTUNE_CACHE", path)
    autotune.reload()
    yield path
    autotune.reload()


SHAPE = (2, 2, 256, 64)


def test_record_lookup_roundtrip(tuned_cache):
    assert autotune.lookup("band", SHAPE, 64, jnp.bfloat16) is None
    autotune.record("band", SHAPE, 64, jnp.bfloat16,
                    {"block_rows": 128}, 1.23, "fwdbwd")
    assert autotune.lookup("band", SHAPE, 64, jnp.bfloat16) == {
        "block_rows": 128}
    # Keyed per (kernel, shape, window, dtype): near-misses stay empty.
    assert autotune.lookup("halo", SHAPE, 64, jnp.bfloat16) is None
    assert autotune.lookup("band", SHAPE, 32, jnp.bfloat16) is None
    assert autotune.lookup("band", SHAPE, 64, jnp.float32) is None
    # The file is valid JSON another process can load.
    autotune.reload()
    assert autotune.lookup("band", SHAPE, 64, jnp.bfloat16) == {
        "block_rows": 128}
    with open(tuned_cache) as f:
        data = json.load(f)
    (key,) = data.keys()
    assert "band" in key and "2x2x256x64" in key and "w64" in key


def test_resolution_precedence(tuned_cache):
    # No entry: shipped defaults.
    assert autotune.band_rows("band", SHAPE, 64, jnp.bfloat16, None) == \
        fa.DEFAULT_BAND_ROWS
    assert autotune.flash_blocks(SHAPE, jnp.bfloat16, None, None) == (
        fa.DEFAULT_BLOCK_Q, fa.DEFAULT_BLOCK_K)
    # Tuned entry beats the default.
    autotune.record("band", SHAPE, 64, jnp.bfloat16,
                    {"block_rows": 128}, 1.0, "fwd")
    autotune.record("flash", SHAPE, 0, jnp.bfloat16,
                    {"block_q": 256, "block_k": 1024}, 1.0, "fwd")
    assert autotune.band_rows("band", SHAPE, 64, jnp.bfloat16, None) == 128
    assert autotune.flash_blocks(SHAPE, jnp.bfloat16, None, None) == (
        256, 1024)
    # Explicit arg beats the tuned entry.
    assert autotune.band_rows("band", SHAPE, 64, jnp.bfloat16, 512) == 512
    assert autotune.flash_blocks(SHAPE, jnp.bfloat16, 512, 512) == (512, 512)
    # Partial explicit: the other half still comes from the cache.
    assert autotune.flash_blocks(SHAPE, jnp.bfloat16, 512, None) == (
        512, 1024)


def test_disabled_cache_ignores_entries(tuned_cache, monkeypatch):
    autotune.record("band", SHAPE, 64, jnp.bfloat16,
                    {"block_rows": 128}, 1.0, "fwd")
    monkeypatch.setenv("TCHVP_AUTOTUNE_CACHE", "0")
    autotune.reload()
    assert autotune.cache_path() is None
    assert autotune.lookup("band", SHAPE, 64, jnp.bfloat16) is None
    assert autotune.band_rows("band", SHAPE, 64, jnp.bfloat16, None) == \
        fa.DEFAULT_BAND_ROWS


def test_kernels_consult_cache(tuned_cache, monkeypatch):
    """The entry points resolve through autotune at trace time — proven
    by observing the lookup, and tuned blocks must not change the math."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 2, 128, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 128, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 128, 8)), jnp.float32)

    seen = []
    orig = autotune.lookup

    def spy(kernel, shape, window, dtype):
        out = orig(kernel, shape, window, dtype)
        seen.append((kernel, tuple(shape), window, out))
        return out

    monkeypatch.setattr(autotune, "lookup", spy)
    base = fa.windowed_mha(q, k, v, window_size=32)
    assert seen and seen[-1][0] == "band" and seen[-1][2] == 32

    autotune.record("band", q.shape, 32, q.dtype, {"block_rows": 64},
                    0.5, "fwd")
    tuned = fa.windowed_mha(q, k, v, window_size=32)
    assert seen[-1][3] == {"block_rows": 64}
    np.testing.assert_allclose(np.asarray(base), np.asarray(tuned),
                               atol=2e-5)

    seen.clear()
    fa.mha(q, k, v)
    assert seen and seen[-1][0] == "flash"
    seen.clear()
    halo = jnp.asarray(rng.normal(size=(1, 2, 32, 8)), jnp.float32)
    fa.windowed_mha_halo(q, jnp.concatenate([halo, k], 2),
                         jnp.concatenate([halo, v], 2),
                         window_size=32, has_prev=0)
    assert seen and seen[-1][0] == "halo"


def test_cli_tune_end_to_end(tuned_cache, capsys):
    """`tchvp tune` sweeps, reports, and persists; bad args exit
    cleanly."""
    from tchvp_tpu.cli import main

    main(["tune", "--kernels", "band", "--window", "32",
          "--shape", "1x1x128x8", "--dtype", "float32",
          "--mode", "fwd", "--iters", "2"])
    out = capsys.readouterr().out
    assert "best" in out and "block_rows" in out
    autotune.reload()
    assert autotune.lookup("band", (1, 1, 128, 8), 32, jnp.float32)

    with pytest.raises(SystemExit):
        main(["tune", "--kernels", "band", "--shape", "1x1x128x8"])  # no --window
    with pytest.raises(SystemExit):
        main(["tune", "--shape", "128x8"])  # malformed shape


def test_tune_banded_end_to_end(tuned_cache):
    """The tuner sweeps real candidates on this backend (interpret mode
    on CPU), persists the winner, and the kernel picks it up."""
    shape = (1, 1, 128, 8)
    params, ms = autotune.tune_banded(
        shape, 32, jnp.float32, mode="fwd", iters=2,
        candidates=(64, 128), verbose=False)
    assert params["block_rows"] in (64, 128) and ms > 0
    assert autotune.band_rows("band", shape, 32, jnp.float32, None) == \
        params["block_rows"]
    # Persisted: survives an in-memory cache drop (fresh-process view).
    autotune.reload()
    assert autotune.lookup("band", shape, 32, jnp.float32)["block_rows"] \
        == params["block_rows"]
