"""Persistent jit-cache enablement that works under the axon runtime.

The axon sitecustomize imports jax at interpreter start, BEFORE any of
our entry points can set JAX_COMPILATION_CACHE_DIR in os.environ — so
the env-var route silently does nothing and every process pays the
remote compile again (60-300 s per program shape over the tunnel).
jax.config.update works after import; call enable_cache() from every
entry point that touches the device.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/pansvr_jax_cache"
_done = False


def enable_cache(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    d = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                    _DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these keys: env vars may still work
