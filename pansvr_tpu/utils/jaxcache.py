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
    try:
        # jax gates the persistent cache on platform in
        # {tpu,gpu,cpu,neuron}; the axon remote-TPU platform is not in
        # the list, so every process recompiled every program
        # (50-470 s per mega-program variant, measured 2026-08-20).
        # The axon client proxies a real TPU client and serializes
        # executables fine — force the gate open.
        from jax._src import compilation_cache as _cc

        with _cc._cache_initialized_mutex:
            _cc._cache_checked = True
            _cc._cache_used = True
    except Exception:
        pass
