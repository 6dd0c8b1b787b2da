import os

# Tests always run on CPU with a virtual 8-device mesh so multi-chip
# sharding logic is exercised without TPU hardware (SURVEY.md §4).
#
# The environment's sitecustomize eagerly registers+initializes the TPU
# (axon) PJRT backend before pytest starts, so setting JAX_PLATFORMS is not
# enough — already-initialized backends must be cleared too.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if jax.default_backend() != "cpu":
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend

    jax.extend.backend.clear_backends()
assert jax.default_backend() == "cpu"
