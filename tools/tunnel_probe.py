"""Tunnel semantics probes: do result copies overlap device execution?

The engine's pipeline order was chosen round-2 on the belief that the
axon tunnel serializes d2h copies behind queued programs (pipe_order
comment in EngineConfig). This probes it directly:

  A. fetch 2 MB with an idle device            -> pure transfer time
  B. dispatch a ~100 ms program, then fetch the
     (already materialized) 2 MB buffer        -> does the copy wait?
  C. same but fetch via copy_to_host_async issued BEFORE the dispatch

Usage: python tools/tunnel_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pansvr_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend())
    # a ~2 MB result buffer (the fused chain buffer's size class)
    buf = jax.device_put(np.random.randint(0, 127, 2_000_000, np.int8))

    # a long compute program (~100 ms): iterated matmul
    x = jax.device_put(np.random.rand(4096, 4096).astype(np.float32))

    @jax.jit
    def burn(a):
        for _ in range(24):
            a = a @ a * 1e-3
        return a

    r = burn(x)
    jax.block_until_ready(r)
    jax.block_until_ready(buf)

    t0 = time.perf_counter()
    r = burn(x)
    jax.block_until_ready(r)
    t_burn = time.perf_counter() - t0
    print(f"burn program           : {t_burn * 1e3:8.1f} ms")

    @jax.jit
    def mk(b):
        return b ^ 1  # fresh 2 MB output buffer each call (no host cache)

    fresh = mk(buf)
    jax.block_until_ready(fresh)
    _ = np.asarray(fresh)

    for trial in range(3):
        fresh = mk(buf)
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        _ = np.asarray(fresh)
        t_fetch = time.perf_counter() - t0
        print(f"A idle fetch fresh 2MB : {t_fetch * 1e3:8.1f} ms")

    for trial in range(3):
        fresh = mk(buf)
        jax.block_until_ready(fresh)
        r = burn(x)  # queue the long program
        t0 = time.perf_counter()
        _ = np.asarray(fresh)  # fetch a READY buffer while it runs
        t_fetch = time.perf_counter() - t0
        t1 = time.perf_counter()
        jax.block_until_ready(r)
        t_all = time.perf_counter() - t1
        print(f"B fetch-during-exec    : {t_fetch * 1e3:8.1f} ms "
              f"(exec wait after {t_all * 1e3:8.1f} ms)")

    for trial in range(3):
        fresh = mk(buf)
        jax.block_until_ready(fresh)
        fresh.copy_to_host_async()
        r = burn(x)
        time.sleep(0.02)
        t0 = time.perf_counter()
        _ = np.asarray(fresh)
        t_fetch = time.perf_counter() - t0
        jax.block_until_ready(r)
        print(f"C async-then-exec fetch: {t_fetch * 1e3:8.1f} ms")

    # E: burn exec time measured honestly (fresh arg each time)
    for trial in range(3):
        y = mk(buf)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        r = burn(x)
        jax.block_until_ready(r)
        print(f"E burn exec            : "
              f"{(time.perf_counter() - t0) * 1e3:8.1f} ms")

    # F: fetch of a tiny READY buffer (pure copy RTT, no dispatch)
    @jax.jit
    def mk8(b):
        return b[:8] ^ 1

    for trial in range(3):
        s8 = mk8(buf)
        jax.block_until_ready(s8)
        t0 = time.perf_counter()
        _ = np.asarray(s8)
        print(f"F tiny ready fetch     : "
              f"{(time.perf_counter() - t0) * 1e3:8.1f} ms")

    # D: dispatch RTT floor — a trivial program end-to-end
    @jax.jit
    def tiny(a):
        return a + 1

    s = jax.device_put(np.zeros(8, np.int32))
    _ = np.asarray(tiny(s))
    for trial in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(tiny(s))
        print(f"D tiny dispatch+fetch  : "
              f"{(time.perf_counter() - t0) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
