"""Sub-phase decomposition of the device front + chain on the bench
world: which part of seed_reads_flat's ~99 ms (B=8192) is probe, lane
layout, extension, coverage/writeback — and chain_batch vs
chain_extract_batch. Drives knob A/Bs (probe=, nf_mult=) from the same
prepared batch so numbers are comparable.

Usage: python tools/profile_front2.py [reps]
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


def dev_time(fn, args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import bench

    from pansvr_tpu.align import engine as E
    from pansvr_tpu.align.engine import AlignEngine, EngineConfig
    from pansvr_tpu.align.host_align import OriResult
    from pansvr_tpu.ops import chain as C
    from pansvr_tpu.ops.seeding import seed_reads_flat

    ds, idx = bench.build_world()
    cfg = EngineConfig()
    eng = AlignEngine(idx, config=cfg, ori_chrom_names=list(ds.genome))
    seqs = [s for r in ds.reads for s in (r.seq1, r.seq2)]
    oris = [OriResult(unmapped=True)] * len(seqs)
    B = 8192

    didx = eng.didx
    prep = eng._prep_batch(seqs[:B], oris[:B])
    words, lens2, mask2 = prep["words"], prep["lens2"], prep["mask2"]
    S0, L = prep["S0"], prep["L"]
    n_ext = max(9, -(-(L - 20) // 16))
    M = max(cfg.mem_slots, (S0 + 1 + 15) // 16 * 16)

    wd = jax.device_put(words)
    ld = jax.device_put(lens2)
    md = jax.device_put(mask2)
    jax.block_until_ready((wd, ld, md))
    print(f"B2={words.shape[0]} S0={S0} L={L} NE={n_ext} M={M} "
          f"NF={cfg.nf_mult * words.shape[0]}")

    # ---- full seed front variants -----------------------------------------
    for kw in (dict(), dict(probe="hash"), dict(ext="steps"),
               dict(nf_mult=8), dict(nf_mult=6), dict(lane_map="bisect")):
        f = jax.jit(lambda w, l, m, kw=kw: seed_reads_flat(
            didx, w, l, m, S0=S0, M=cfg.max_seeds, n_ext_steps=n_ext,
            nf_mult=kw.pop("nf_mult", cfg.nf_mult), **kw))
        t = dev_time(f, (wd, ld, md), reps)
        print(f"seed_flat {str(kw):<22}: {t * 1e3:8.2f} ms/call")

    # ---- occupancy: how full is the NF lane pool? --------------------------
    sb = jax.jit(lambda w, l, m: seed_reads_flat(
        didx, w, l, m, S0=S0, M=cfg.max_seeds, n_ext_steps=n_ext,
        nf_mult=cfg.nf_mult))(wd, ld, md)
    nhit = np.asarray(sb.valid).sum()
    rh = np.asarray(sb.valid).sum(axis=1)
    print(f"occupancy: {nhit} valid M-slots; per-row mean "
          f"{rh.mean():.2f} p50 {np.percentile(rh, 50):.0f} "
          f"p95 {np.percentile(rh, 95):.0f} p99 {np.percentile(rh, 99):.0f} "
          f"max {rh.max()}; overflow rows "
          f"{(np.asarray(sb.n_overflow) > 0).sum()}")

    # ---- probe-only (bisect) ------------------------------------------------
    def probe_only(w, l, m):
        out = seed_reads_flat(didx, w, l, m, S0=S0, M=cfg.max_seeds,
                              n_ext_steps=n_ext, nf_mult=cfg.nf_mult,
                              stop_after="probe")
        return out

    t = dev_time(jax.jit(probe_only), (wd, ld, md), reps)
    print(f"probe-only             : {t * 1e3:8.2f} ms/call")

    def lanes_only(w, l, m):
        return seed_reads_flat(didx, w, l, m, S0=S0, M=cfg.max_seeds,
                               n_ext_steps=n_ext, nf_mult=cfg.nf_mult,
                               stop_after="lanes")

    t = dev_time(jax.jit(lanes_only), (wd, ld, md), reps)
    print(f"probe+lanes            : {t * 1e3:8.2f} ms/call")

    # ---- chain decomposition ------------------------------------------------
    es, stats3 = E._device_front(
        didx, wd, ld, md, S0=S0, S=cfg.max_seeds, M=M, front=cfg.front,
        n_ext=n_ext, merge=cfg.merge, nf_mult=cfg.nf_mult)
    jax.block_until_ready((es, stats3))
    is_str2 = jax.device_put(
        np.concatenate([prep["is_str"], prep["is_str"]]))
    K = 8
    args8 = tuple(jax.device_put(np.asarray(a[:, :K]))
                  for a in (es.read_begin, es.read_end, es.ref_begin,
                            es.ref_end, es.cov, es.seed_id, es.valid))
    jax.block_until_ready(args8)

    cb = jax.jit(lambda *a: C.chain_batch(*a[:7], a[7]))
    t = dev_time(cb, args8 + (is_str2,), reps)
    print(f"chain_batch K=8        : {t * 1e3:8.2f} ms/call")

    cr = C.chain_batch(*args8, is_str2)
    jax.block_until_ready((cr.dist, cr.pre, cr.valid))
    ce = jax.jit(C.chain_extract_batch)
    t = dev_time(ce, (cr.dist, cr.pre, cr.valid), reps)
    print(f"chain_extract K=8      : {t * 1e3:8.2f} ms/call")

    t = dev_time(jax.jit(lambda s3, i2: E._chain_fuse(s3, es, i2, K)),
                 (stats3, is_str2), reps)
    print(f"chain_fuse K=8 (full)  : {t * 1e3:8.2f} ms/call")


if __name__ == "__main__":
    main()
