"""Persistent XLA compilation cache for bench/debug/CLI entry points.

The pipeline compiles dozens of programs (prefilter moments, fused
align+status, line scanmatcher sweeps, LM solver levels); on a remote
tunneled device a cold run spends several minutes in compiles. The
persistent cache (keyed on HLO + backend fingerprint, so numerical
changes recompile) makes second runs start warm — measured to also work
with the session's 'axon' TPU plugin.

Tests configure the same thing themselves (tests/conftest.py) with a
CPU-suffixed directory; this helper is for device entry points
(bench.py, bench_multichip.py, scripts/*, cli).
"""

import os


def enable_persistent_cache(suffix=""):
    import jax

    cache_dir = os.environ.get(
        "DGS_JAX_CACHE",
        os.path.expanduser("~/.cache/dgs_jax_cache" + suffix),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
