"""Persistent XLA compilation cache.

The full HTM step takes ~20-40 s to compile on the TPU backend (the
fused table kernel plus the scan body); every fresh process pays it
again. JAX's persistent compilation cache removes that: executables are
serialized to disk keyed by (HLO, compile options, backend), so any
later process with the same program starts warm.

Measured over the axon v5e tunnel (`scripts/mb_compile_cache.py`,
B=256 fast-stack learning scan): first-call time 115.1 s cold ->
18.5 s with a warm cache (the residual is backend init + the 16
measured steps), cache size ~18 MB.

Call it once, before the first jit dispatch:

    from bithtm_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()            # ~/.cache/bithtm_tpu/xla
    enable_compilation_cache("/ssd/xla")  # shared production cache

`example.py` and `bench.py` expose it as `--compile_cache [DIR]`.

Note: on the CPU backend, XLA may log a loud (harmless) AOT
machine-feature-mismatch warning when reloading cached executables; the
cache's production target is the TPU backend, where reloads are clean.
"""

from __future__ import annotations

import os


DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "bithtm_tpu", "xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache at `cache_dir`
    (default ``~/.cache/bithtm_tpu/xla``). Returns the directory used.

    Thresholds are zeroed so every program in the library caches, not
    just the slowest: the win here is cross-process warm start, and the
    whole cache for the full HTM pipeline is tens of MB.
    """
    import jax

    cache_dir = cache_dir or DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
