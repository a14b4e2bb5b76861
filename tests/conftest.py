import os
import sys

# Device-parallel tests run on a virtual 8-device CPU mesh.  NB: this
# environment pre-imports jax (sitecustomize), so the JAX_PLATFORMS env var
# is too late — use the config API instead.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_TESTS = "/root/reference/tests"


@pytest.fixture
def reference_tests_dir():
    if not os.path.isdir(REFERENCE_TESTS):
        pytest.skip("reference test data not available")
    return REFERENCE_TESTS
