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

# Persistent XLA compilation cache: the df BCR solver programs unroll
# log2(N) levels of double-float block algebra and take minutes to
# compile on a 1-core CI host. Caching compiled executables (keyed on
# HLO, so any numerical change recompiles) keeps the fast gate inside
# its <5 min contract; .github/workflows/ci.yml persists the directory
# across runs with actions/cache.
_cache_dir = os.environ.get(
    "DGS_JAX_CACHE", os.path.expanduser("~/.cache/dgs_jax_cache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", jax.devices()
