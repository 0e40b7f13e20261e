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
