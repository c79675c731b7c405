"""Persistent XLA compilation cache.

Full-model compiles take minutes on the remote TPU backend; caching them on
disk makes every entry point (trainer CLI, bench, eval tools, driver checks)
near-instant after the first compile of a given shape/config.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax
    cache = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_compilation"))
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without these flags
