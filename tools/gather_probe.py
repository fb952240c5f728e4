"""On-chip microbenchmark of gather strategies.

The engine front is bound by XLA's random-gather throughput (~1e8
gathers/s measured round 1-2). This probes every plausible layout trick
so optimization follows measurement, not guesswork:

  take32     - jnp.take of int32 from a 1-D table (the current front op)
  take64     - same indices, int64 table (2x bytes per gather row)
  take128    - (N, 4) int32 table rows, row-indexed (4x bytes per row)
  slice4     - vmapped dynamic_slice of 4 words (unaligned)
  ta_inrow   - (B, M) take_along_axis (the merge/expand op)
  sort_nf    - lax.sort of the flat lane axis, 2 keys + 3 payloads
               (cost reference: what a sort-based rewrite would pay)

Usage: python tools/gather_probe.py [n_idx] [table_mb]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        r = r[0] if isinstance(r, tuple) else r
    r.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    NF = int(sys.argv[1]) if len(sys.argv) > 1 else 163840
    mb = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    nw = int(mb * 1e6 / 4)
    rng = np.random.default_rng(0)
    table32 = jnp.asarray(rng.integers(0, 1 << 30, nw, dtype=np.int32))
    table64 = jnp.asarray(
        rng.integers(0, 1 << 60, nw // 2, dtype=np.int64))
    table128 = table32[: (nw // 4) * 4].reshape(-1, 4)
    idx = jnp.asarray(rng.integers(0, nw - 8, NF, dtype=np.int32))
    idx64 = jnp.minimum(idx >> 1, nw // 2 - 2)
    idx128 = jnp.minimum(idx >> 2, nw // 4 - 2)

    B, M = 16384, 32
    bm = jnp.asarray(rng.integers(0, 1 << 20, (B, M), dtype=np.int32))
    cols = jnp.asarray(rng.integers(0, M, (B, M), dtype=np.int32))

    take32 = jax.jit(lambda t, i: t[i])
    take64 = jax.jit(lambda t, i: t[i])
    take128 = jax.jit(lambda t, i: t[i])

    @jax.jit
    def slice4(t, i):
        return jax.vmap(lambda s: jax.lax.dynamic_slice(t, (s,), (4,)))(i)

    @jax.jit
    def ta_inrow(a, c):
        return jnp.take_along_axis(a, c, axis=1)

    @jax.jit
    def sort_nf(k1, k2, p1, p2, p3):
        return jax.lax.sort((k1, k2, p1, p2, p3), dimension=0, num_keys=2,
                            is_stable=True)

    # ---- round-3 candidates ------------------------------------------------
    # aligned row windows for MEM extension: 2 gathers of a 32-word row
    # + barrel rotate by (woff & 31), replacing ~20 per-step word gathers
    rows32 = table32[: (nw // 32) * 32].reshape(-1, 32)
    idx_r = jnp.minimum(idx >> 5, nw // 32 - 2)

    @jax.jit
    def rows2_rotate(t, i, woff):
        w = jnp.concatenate([t[i], t[i + 1]], axis=1)      # (NF, 64)
        amt = woff & 31
        for k in (16, 8, 4, 2, 1):
            rolled = jnp.roll(w, -k, axis=1)
            w = jnp.where((amt & k)[:, None] != 0, rolled, w)
        return w[:, :24]

    # writeback: per-row contiguous (M, C) slice from a flat (NF, C) table
    C = 6
    flat6 = table32[: NF * C].reshape(NF, C)
    row_starts = jnp.asarray(
        np.sort(rng.integers(0, NF - M, B).astype(np.int32)))

    @jax.jit
    def slice_rows(t, s):
        return jax.vmap(
            lambda s_: jax.lax.dynamic_slice(t, (s_, 0), (M, C)))(s)

    # in-row gather as one-hot masked sum (src_run is over the tiny M axis)
    S = 32

    @jax.jit
    def onehot_inrow(a, c):
        oh = c[:, :, None] == jnp.arange(M, dtype=jnp.int32)[None, None, :]
        return jnp.sum(jnp.where(oh, a[:, None, :], 0), axis=2)

    # one 4-wide entry row vs 4 separate takes (same indices)
    @jax.jit
    def take4x1(t, i):
        return t[i], t[i + 1], t[i + 2], t[i + 3]

    k1 = idx
    k2 = jnp.flip(idx)
    res = {}
    res["take32"] = timeit(take32, table32, idx)
    res["take64"] = timeit(take64, table64, idx64)
    res["take128"] = timeit(take128, table128, idx128)
    try:
        res["slice4"] = timeit(slice4, table32, idx)
    except Exception as e:  # pragma: no cover
        res["slice4"] = float("nan")
        print("slice4 failed:", e)
    res["take4x1"] = timeit(take4x1, table32, idx)
    res["rows2_rotate"] = timeit(rows2_rotate, rows32, idx_r, idx)
    res["slice_rows(M,6)"] = timeit(slice_rows, flat6, row_starts)
    res["ta_inrow(B,M)"] = timeit(ta_inrow, bm, cols)
    res["onehot_inrow"] = timeit(onehot_inrow, bm, cols)
    res["sort_nf"] = timeit(sort_nf, k1, k2, idx, idx, idx)

    print(f"NF={NF}  table={mb} MB  backend={jax.default_backend()}")
    for k, v in res.items():
        n_elem = B * M if ("B,M" in k or "onehot" in k or "M,6" in k) \
            else NF
        print(f"  {k:16s} {v * 1e3:8.3f} ms   "
              f"{n_elem / v / 1e6:8.1f} M idx/s")


if __name__ == "__main__":
    main()
