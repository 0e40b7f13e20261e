"""ThreadSanitizer pass over the native clippack loader (survey §5.2).

The reference is single-threaded everywhere ("nothing to replicate");
the TPU build's C++ loader reintroduces threads, so it gets a real race
detector: `native/clippack_stress.cc` hammers the producer ring, shared
readers, and the stop path under `-fsanitize=thread`. The test fails on
any TSAN report OR on a checksum mismatch between contended and
single-producer runs (determinism under contention).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


def _tsan_available() -> bool:
    if shutil.which("g++") is None:
        return False
    import glob

    return bool(glob.glob("/usr/lib/gcc/*/*/libtsan.so*"))


@pytest.mark.skipif(not _tsan_available(), reason="no g++/libtsan")
def test_loader_is_race_free_under_tsan(tmp_path):
    from tchvp_tpu.data.clippack import pack_clips

    pack = str(tmp_path / "clips.cpk")
    rng = np.random.default_rng(0)
    pack_clips(pack, rng.integers(0, 256, (24, 2, 8, 8, 3), dtype=np.uint8))

    binary = str(tmp_path / "stress")
    build = subprocess.run(
        [
            "g++", "-std=c++17", "-O1", "-g", "-fsanitize=thread",
            os.path.join(NATIVE, "clippack.cc"),
            os.path.join(NATIVE, "clippack_stress.cc"),
            "-o", binary, "-pthread",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    run = subprocess.run(
        [binary, pack, "3"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "TSAN_OPTIONS": "halt_on_error=1 exitcode=66"},
    )
    out = run.stdout + run.stderr
    assert "ThreadSanitizer" not in out, out[-4000:]
    assert run.returncode == 0, f"rc={run.returncode}\n{out[-4000:]}"
    assert "stress OK" in run.stdout
