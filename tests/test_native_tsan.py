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


def _san_available(lib: str) -> bool:
    if shutil.which("g++") is None:
        return False
    import glob

    return bool(glob.glob(f"/usr/lib/gcc/*/*/lib{lib}.so*"))


@pytest.mark.parametrize(
    "flag,lib,env",
    [
        ("thread", "tsan", {"TSAN_OPTIONS": "halt_on_error=1 exitcode=66"}),
        ("address,undefined", "asan",
         {"ASAN_OPTIONS": "detect_leaks=1", "UBSAN_OPTIONS": "print_stacktrace=1"}),
    ],
    ids=["tsan", "asan-ubsan"],
)
def test_loader_is_clean_under_sanitizers(tmp_path, flag, lib, env):
    if not _san_available(lib):
        pytest.skip(f"no g++/lib{lib}")
    from tchvp_tpu.data.clippack import pack_clips

    pack = str(tmp_path / "clips.cpk")
    rng = np.random.default_rng(0)
    pack_clips(pack, rng.integers(0, 256, (24, 2, 8, 8, 3), dtype=np.uint8))

    binary = str(tmp_path / "stress")
    build = subprocess.run(
        [
            "g++", "-std=c++17", "-O1", "-g", f"-fsanitize={flag}",
            "-fno-sanitize-recover=all", "-fno-omit-frame-pointer",
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
        env={**os.environ, **env},
    )
    out = run.stdout + run.stderr
    for marker in ("ThreadSanitizer", "AddressSanitizer", "runtime error",
                   "LeakSanitizer"):
        assert marker not in out, out[-4000:]
    assert run.returncode == 0, f"rc={run.returncode}\n{out[-4000:]}"
    assert "stress OK" in run.stdout
