"""Experiment run records — reproducibility for every training command.

The reference has no record of how a checkpoint was produced: its scripts
hardcode hyperparameters at module scope (``/root/reference/Model.py:17-21``,
``FCT.py:273-276``) and the ``.tar`` checkpoints carry only weights. Here
every training command writes ``run.json`` next to its checkpoints with the
fully-resolved flags (after ``--config`` YAML merging), the environment
(devices, backend, library versions, git revision), and the launch argv —
enough to re-run the exact experiment or audit an old checkpoint dir.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
from typing import Any, Dict, Optional


def _git_revision() -> Optional[str]:
    """Best-effort `git rev-parse HEAD` of the working directory."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        )
        return out.stdout.strip() or None
    except (OSError, subprocess.SubprocessError):
        return None


def _jsonable(v: Any) -> Any:
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    return repr(v)


def collect_run_record(
    args: Any = None, extra: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Assemble the record without writing it (testable pure-ish core)."""
    import jax

    resolved = {}
    if args is not None:
        resolved = {
            k: _jsonable(v)
            for k, v in sorted(vars(args).items())
            if not callable(v) and k != "fn"
        }
    record: Dict[str, Any] = {
        "timestamp_utc": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "argv": list(sys.argv),
        "resolved_args": resolved,
        "environment": {
            "jax_version": jax.__version__,
            "backend": jax.default_backend(),
            "device_count": jax.device_count(),
            "devices": [str(d) for d in jax.devices()][:16],
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "python": sys.version.split()[0],
            "xla_flags": os.environ.get("XLA_FLAGS"),
        },
        "git_revision": _git_revision(),
    }
    if extra:
        record.update(_jsonable(extra))
    return record


def write_run_record(
    checkpoint_dir: str,
    args: Any = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write ``run.json`` into ``checkpoint_dir`` (created if needed).

    Only process 0 writes under multi-host launches. Returns the path
    (even when a non-zero process skipped the write).
    """
    import jax

    path = os.path.join(checkpoint_dir, "run.json")
    if jax.process_index() != 0:
        return path
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(collect_run_record(args, extra), f, indent=2)
        f.write("\n")
    return path
