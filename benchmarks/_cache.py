"""Shared persistent-compile-cache setup for the benchmark scripts.

416^2 b128 programs take 10-20 min to compile through the remote TPU
compile helper; bench.py already persists them under .jax_bench_cache and
the benchmark scripts share the same cache so A/B sweeps (e.g.
bench_train --batch 128/136/144) reuse each other's programs.
Call enable() after importing jax, before the first jit.
"""

import os


def enable():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
