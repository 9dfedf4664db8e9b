import os

# Tests run on a virtual 8-device CPU mesh: sharding correctness is validated
# without TPU hardware (the driver separately dry-runs the multi-chip path).
#
# The session environment pins JAX at a TPU (JAX_PLATFORMS=axon, registered by
# a sitecustomize that imports jax before this file runs), so the env var is
# too late — override through jax.config instead, which wins as long as no
# backend has been initialized yet.  Set NEKSTAB_TEST_TPU=1 to run the suite
# on the real chip.
if not os.environ.get("NEKSTAB_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
