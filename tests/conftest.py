import os

# Tests run on a virtual 8-device CPU mesh: sharding logic is exercised
# without TPU hardware, and results must be identical to 1-device runs
# (the reference's resource-invariance test, tests/simple_test.py:78-83).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
