import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is exercised
# without TPU hardware, and results must be identical to 1-device runs
# (the reference's resource-invariance test, tests/simple_test.py:78-83).
#
# NOTE: the axon TPU plugin in this environment overrides the
# JAX_PLATFORMS env var, so the platform must be forced through
# jax.config before any backend initialization. Set
# SIMKA_TPU_TEST_PLATFORM=axon to run the suite on the real chip.
_platform = os.environ.get("SIMKA_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
