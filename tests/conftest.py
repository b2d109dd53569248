"""Test configuration: force CPU JAX with a simulated 8-device mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count``); real-TPU runs happen via
bench.py / the driver.  Env vars must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin force-prepends itself to JAX_PLATFORMS; the config
# update below overrides it so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
