import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. XLA_FLAGS must be in the env before the CPU
# backend initialises; jax_platforms must be forced via config because
# the environment's sitecustomize registers an 'axon' TPU backend and
# overrides the env var.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
