"""On-chip microbench v2: amortizes the ~25 ms tunnel dispatch RTT by
repeating each op INSIDE one jitted program (chained through a data
dependency so XLA can't CSE the iterations away), then dividing.

Usage: python tools/probe_ab2.py [inner_reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pansvr_tpu.utils.jaxcache import enable_cache

enable_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, args, outer=3):
    """NB: jax.block_until_ready does NOT reliably wait on the axon
    remote backend (measured 2026-08-20: a fori_loop whose fetch takes
    1.1 s 'blocks' in 0.1 ms). Fetch the result to host instead — the
    d2h RTT rides on every sample, so keep inner rep counts high."""
    out = np.asarray(fn(*args))
    ts = []
    for _ in range(outer):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.RandomState(0)
    Q = 475136
    NK = 131072

    def rep(body, x0, aux):
        def f(x, aux):
            def it(i, x):
                return body(x, aux)
            return jax.lax.fori_loop(0, R, it, x)
        return jax.jit(f), x0, aux

    # empty program: the dispatch floor
    f = jax.jit(lambda x: x + 1)
    xd = jax.device_put(np.int32(0))
    t0 = timed("floor", f, (xd,))
    print(f"dispatch floor: {t0*1e3:7.2f} ms")

    # gathers: perturb indices by x to defeat CSE
    qi = jax.device_put(rng.randint(0, NK, size=Q).astype(np.int32))
    for nm, rows in (("4B", 1), ("8B", 2), ("16B", 4)):
        tb = jax.device_put(np.zeros((NK, rows), np.int32).squeeze()
                            if rows == 1 else np.zeros((NK, rows), np.int32))
        def body(x, aux, rows=rows):
            q, t_ = aux
            idx = (q + x) & (NK - 1)
            g = t_[idx]
            return x + (g.sum() if rows == 1 else g[..., 0].sum())
        fj, x0, aux = rep(body, xd, (qi, tb))
        t = timed(nm, fj, (x0, aux))
        per = (t - t0) / R
        print(f"gather {nm:>4}-row x{Q}: {per*1e3:7.2f} ms "
              f"({Q/per/1e6:6.0f} M/s)")

    # dependent-gather chain (bisect analog: 4 iterations)
    tb = jax.device_put(rng.randint(0, NK, size=NK).astype(np.int32))
    def body(x, aux):
        q, t_ = aux
        idx = (q + x) & (NK - 1)
        for _ in range(4):
            idx = t_[idx] & (NK - 1)
        return x + idx.sum()
    fj, x0, aux = rep(body, xd, (qi, tb))
    t = timed("dep4", fj, (x0, aux))
    print(f"4 dependent 4B gathers x{Q}: {(t-t0)/R*1e3:7.2f} ms")

    # sort + cumsum at join size
    N = Q + NK
    keys = jax.device_put(rng.randint(0, 1 << 30, size=N).astype(np.int32))
    pay = jax.device_put(np.arange(N, dtype=np.int32))
    def body(x, aux):
        k, p = aux
        ks, ps = jax.lax.sort((k ^ x, p), num_keys=1)
        return x + ks[0] + ps[-1]
    fj, x0, aux = rep(body, xd, (keys, pay))
    t = timed("sort2", fj, (x0, aux))
    print(f"sort 2-op int32 x{N}: {(t-t0)/R*1e3:7.2f} ms")

    def body(x, aux):
        (k,) = aux
        return x + jnp.cumsum(k + x)[-1]
    fj, x0, aux = rep(body, xd, (keys,))
    t = timed("cumsum", fj, (x0, aux))
    print(f"cumsum int32 x{N}: {(t-t0)/R*1e3:7.2f} ms")

    # big-table gather (hash_g analog: 16.7M entries)
    BT = 1 << 24
    bigt = jax.device_put(np.zeros(BT, np.int32))
    bq = jax.device_put(rng.randint(0, BT, size=Q).astype(np.int32))
    def body(x, aux):
        q, t_ = aux
        return x + t_[(q + x) & (BT - 1)].sum()
    fj, x0, aux = rep(body, xd, (bq, bigt))
    t = timed("big", fj, (x0, aux))
    per = (t - t0) / R
    print(f"gather 4B from 16.7M-table x{Q}: {per*1e3:7.2f} ms "
          f"({Q/per/1e6:6.0f} M/s)")

    # small-table gather (128K j table): does table size matter?
    st = jax.device_put(np.zeros(1 << 12, np.int32))
    def body(x, aux):
        q, t_ = aux
        return x + t_[(q + x) & ((1 << 12) - 1)].sum()
    fj, x0, aux = rep(body, xd, (bq, st))
    t = timed("small", fj, (x0, aux))
    per = (t - t0) / R
    print(f"gather 4B from 4K-table   x{Q}: {per*1e3:7.2f} ms "
          f"({Q/per/1e6:6.0f} M/s)")

    # one-hot matmul "gather" from a small table: (Q,K)@(K,) in bf16
    # K=4096: does the MXU beat the gather unit on small tables?
    K = 4096
    stf = jax.device_put(np.zeros((K, 8), np.float32))
    qs = jax.device_put(rng.randint(0, K, size=Q).astype(np.int32))
    def body(x, aux):
        q, t_ = aux
        oh = jax.nn.one_hot((q + x) & (K - 1), K, dtype=jnp.bfloat16)
        r = oh @ t_.astype(jnp.bfloat16)
        return x + r[..., 0].sum().astype(jnp.int32)
    fj, x0, aux = rep(body, xd, (qs, stf))
    t = timed("onehot", fj, (x0, aux))
    print(f"one-hot matmul 4K-table   x{Q}: {(t-t0)/R*1e3:7.2f} ms")


def extra():
    """Round-4 additions: compaction primitives at probe scale."""
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.RandomState(0)
    Q = 475136
    U = 1 << 18          # compaction budget (262144)

    def rep(body, x0, aux):
        def f(x, aux):
            def it(i, x):
                return body(x, aux)
            return jax.lax.fori_loop(0, R, it, x)
        return jax.jit(f), x0, aux

    f = jax.jit(lambda x: x + 1)
    xd = jax.device_put(np.int32(0))
    t0 = timed("floor", f, (xd,))
    print(f"dispatch floor: {t0*1e3:7.2f} ms")

    alive = jax.device_put((rng.rand(Q) < 0.336).astype(np.int32))
    vals = jax.device_put(rng.randint(0, 1 << 30, size=Q).astype(np.int32))

    # scatter-compaction: cumsum rank + .at[slot].set into U slots
    def body(x, aux):
        a, v = aux
        a = (a + x) & 1                # depends on x: no LICM
        rank = jnp.cumsum(a) - 1
        slot = jnp.where((a > 0) & (rank < U), rank, U)
        tbl = jnp.full((U + 1,), -1, jnp.int32).at[slot].set(v, mode="drop")
        return x + (tbl[:U].sum() & 1)
    fj, x0, aux = rep(body, xd, (alive, vals))
    t = timed("scat", fj, (x0, aux))
    print(f"cumsum+scatter-compact Q={Q}->U={U}: {(t-t0)/R*1e3:7.2f} ms")

    # sort-compaction: 1-key sort (dead last) carrying 2 payloads
    def body(x, aux):
        a, v = aux
        key = ((a + x) & 1)
        ks, p1, p2 = jax.lax.sort(
            (key, v, jnp.arange(Q, dtype=jnp.int32)), num_keys=1)
        return x + (p1[:U].sum() & 1) + (p2[0] & 1)
    fj, x0, aux = rep(body, xd, (alive, vals))
    t = timed("sortc", fj, (x0, aux))
    print(f"sort-compact (1 key + 2 payload) Q={Q}: {(t-t0)/R*1e3:7.2f} ms")

    # 2-key sort + 1 payload at U (dedup scale)
    k1 = jax.device_put(rng.randint(0, 1 << 24, size=U).astype(np.int32))
    k2 = jax.device_put(rng.randint(0, 1 << 16, size=U).astype(np.int32))
    def body(x, aux):
        a, b = aux
        ks, k2s, ps = jax.lax.sort(
            (a ^ (x & 1), b, jnp.arange(U, dtype=jnp.int32)), num_keys=2)
        return x + (ks[0] & 1) + (ps[-1] & 1)
    fj, x0, aux = rep(body, xd, (k1, k2))
    t = timed("sortU", fj, (x0, aux))
    print(f"sort 2-key+1-payload x{U}: {(t-t0)/R*1e3:7.2f} ms")

    # gather at U lanes from 128K 4B table (bisect-at-compact analog)
    NK = 131072
    tb = jax.device_put(rng.randint(0, NK, size=NK).astype(np.int32))
    qU = jax.device_put(rng.randint(0, NK, size=U).astype(np.int32))
    def body(x, aux):
        q, t_ = aux
        idx = (q + x) & (NK - 1)
        for _ in range(4):
            idx = t_[idx] & (NK - 1)
        return x + (idx.sum() & 1)
    fj, x0, aux = rep(body, xd, (qU, tb))
    t = timed("dep4U", fj, (x0, aux))
    print(f"4 dependent 4B gathers xU={U}: {(t-t0)/R*1e3:7.2f} ms")

    # segmented-broadcast (cummax of value where run head) at U
    def body(x, aux):
        a, b = aux
        a = a + (x & 1)
        heads = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                 (a[1:] != a[:-1]).astype(jnp.int32)])
        rid = jnp.cumsum(heads) - 1
        val = jnp.where(heads > 0, b, -1)
        s_step = 1
        seg = val
        while s_step < U:
            sh = jnp.concatenate([jnp.full((s_step,), -1, jnp.int32),
                                  seg[:-s_step]])
            seg = jnp.maximum(seg, sh)
            s_step *= 2
        return x + (seg.sum() & 1) + (rid[-1] & 1)
    fj, x0, aux = rep(body, xd, (k1, k2))
    t = timed("segbU", fj, (x0, aux))
    print(f"doubling segmented-broadcast xU={U}: {(t-t0)/R*1e3:7.2f} ms")


if __name__ == "__main__":
    if os.environ.get("PROBE_EXTRA"):
        extra()
    else:
        main()
