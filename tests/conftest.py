"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip code paths are exercised via
``--xla_force_host_platform_device_count=8`` (no TPU pod available in CI);
x64 is enabled so solver-path tests can check float64 numerics.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the session's 'axon' TPU plugin ignores JAX_PLATFORMS: force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
