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
