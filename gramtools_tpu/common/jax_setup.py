"""JAX runtime configuration helpers."""
from __future__ import annotations

import os

_done = False


def enable_compile_cache():
    """Persistent XLA compile cache: the search-scan kernels compile once
    per (shape, config) per machine instead of per process."""
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = os.environ.get(
        "GRAMTOOLS_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gramtools_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
