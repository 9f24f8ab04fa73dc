"""Test configuration: force an 8-device virtual CPU mesh for sharding tests.

Must run before jax is imported anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend so
# tests never compile over the (slow) device tunnel.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = "/root/reference/testdata"


def fixture_path(name: str) -> str:
    return os.path.join(TESTDATA, name)
