"""Persistent JAX compilation cache.

TPU compiles here go through a remote compile service and cost 1-5
minutes per new program shape; without a disk cache every fresh process
pays them again.  Call enable() before the first jit compilation.
"""

from __future__ import annotations

import os

_enabled = False


def enable(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    _enabled = True
    path = path or os.environ.get("LRZ_JAX_CACHE",
                                  os.path.expanduser("~/.cache/lrz_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
