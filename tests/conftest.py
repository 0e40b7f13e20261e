"""Test env: force CPU with 8 virtual devices so sharded paths are
exercised without a TPU pod (survey §4 rebuild strategy)."""

import os
import sys

# Force CPU: the ambient environment may point JAX at a TPU backend (e.g.
# JAX_PLATFORMS=axon), where fp32 matmuls run at reduced precision and
# numeric parity tests would wrongly fail. Override with
# TCHVP_TEST_PLATFORM to run the suite elsewhere deliberately.
_PLATFORM = os.environ.get("TCHVP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A pytest plugin may already have imported jax, in which case the env var
# is too late — the config route still works because the backend
# initializes lazily on first device use.
import jax  # noqa: E402

jax.config.update("jax_platforms", _PLATFORM)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    import jax

    print(f"\n[tchvp tests] jax backend: {jax.default_backend()}, devices: {len(jax.devices())}")


# Modules dominated by multi-device mesh compiles, flow-level training
# loops, or subprocess drivers — the heaviest per-module call-time sums
# from the round-4 full `--durations=0` run (values in parentheses,
# seconds, measured on the 1-core host). Marking these makes
# `-m "not slow"` a ~9-minute inner-loop subset; the full suite stays
# the merge gate. Per-test opt-in via @pytest.mark.slow also works.
SLOW_MODULES = {
    "test_parallel",        # 840 — every mesh/shard_map parity matrix
    "test_flow_parallel",   # 598 — flow-level multi-axis training
    "test_multihost",       # 560 — 2-process jax.distributed subprocess
    "test_flows",           # 478 — full training-loop journeys
    "test_export",          # 348 — AOT export/serve roundtrips
    "test_moe",             # 267 — routed-FFN + ep parity
    "test_kernels",         # 169 — Pallas interpret-mode kernels
    "test_model_shapes",    # 130 — whole-zoo golden shape sweep
    "test_fsdp",            # 120 — ZeRO-3 step parity
    "test_device_prefetch", # 100 — overlapped-transfer timing loops
    "test_quant",           #  97 — int8 engine + pipelined serving
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = getattr(item, "module", None)
        name = getattr(mod, "__name__", "").rsplit(".", 1)[-1]
        if name in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
