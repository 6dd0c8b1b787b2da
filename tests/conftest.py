import os

# Tests always run on CPU with a virtual 8-device mesh so multi-chip
# sharding logic is exercised without TPU hardware (SURVEY.md §4).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
