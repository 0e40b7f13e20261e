"""Real multi-process multi-host validation (component ⊕C).

Unlike the rest of the suite (one process, 8 virtual devices), this
spawns two OS processes with ``jax.distributed``: per-process ClipPack
shards, global mesh-sharded batches, GSPMD gradient psum across the
process boundary. Asserts loss streams stay bit-identical (replicated
state in sync).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_training():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "validate_multihost.py"), "2"],
        capture_output=True, text=True, timeout=560, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost OK" in out.stdout, out.stdout
