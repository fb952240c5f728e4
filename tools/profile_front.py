"""Direct on-chip timing of the engine's device programs on the bench
world: front (seed+merge), chain, DP — each timed as N repeated
dispatches with one final block (amortizes tunnel RTTs), so the numbers
are true device throughput, separable from the end-to-end wall rate.

Usage: python tools/profile_front.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pansvr_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import numpy as np


def dev_time(fn, args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import bench

    from pansvr_tpu.align import engine as E
    from pansvr_tpu.align.engine import AlignEngine, EngineConfig
    from pansvr_tpu.align.host_align import OriResult
    from pansvr_tpu.ops.seeding import (
        merge_expand_device, merge_expand_device2, seed_reads_flat)

    ds, idx = bench.build_world()
    cfg = EngineConfig()
    eng = AlignEngine(idx, config=cfg, ori_chrom_names=list(ds.genome))
    seqs = [s for r in ds.reads for s in (r.seq1, r.seq2)]
    oris = [OriResult(unmapped=True)] * len(seqs)
    B = 8192

    didx = eng.didx
    for name, arr in [
        ("uni_words", didx.uni_words), ("kmer_g", didx.kmer_g),
        ("off_g", didx.off_g), ("uni_pos", didx.uni_pos),
        ("hash_g", didx.hash_g),
    ]:
        print(f"  table {name}: {arr.size * arr.dtype.itemsize / 1e6:.2f} MB")

    prep = eng._prep_batch(seqs[:B], oris[:B])
    words, lens2, mask2 = prep["words"], prep["lens2"], prep["mask2"]
    S0, L = prep["S0"], prep["L"]
    n_ext = max(9, -(-(L - 20) // 16))
    M = max(cfg.mem_slots, (S0 + 1 + 15) // 16 * 16)

    wd = jax.device_put(words)
    ld = jax.device_put(lens2)
    md = jax.device_put(mask2)
    jax.block_until_ready((wd, ld, md))

    # ---- seeding alone ----------------------------------------------------
    sf = jax.jit(lambda w, l, m: seed_reads_flat(
        didx, w, l, m, S0=S0, M=cfg.max_seeds, n_ext_steps=n_ext,
        nf_mult=cfg.nf_mult))
    t = dev_time(sf, (wd, ld, md), reps)
    print(f"seed_reads_flat       : {t * 1e3:8.2f} ms/call")
    sb = sf(wd, ld, md)
    jax.block_until_ready(sb)

    # ---- merge/expand variants -------------------------------------------
    me1 = jax.jit(lambda s: merge_expand_device(s, didx, S=cfg.max_seeds))
    me2 = jax.jit(lambda s: merge_expand_device2(s, didx, S=cfg.max_seeds))
    t1 = dev_time(me1, (sb,), reps)
    t2 = dev_time(me2, (sb,), reps)
    print(f"merge_expand_device   : {t1 * 1e3:8.2f} ms/call")
    print(f"merge_expand_device2  : {t2 * 1e3:8.2f} ms/call")

    # ---- fused front (what the engine dispatches) --------------------------
    for merge in (1, 2):
        ff = lambda w, l, m, mg=merge: E._device_front(
            didx, w, l, m, S0=S0, S=cfg.max_seeds, M=M, front=cfg.front,
            n_ext=n_ext, merge=mg, nf_mult=cfg.nf_mult)
        t = dev_time(ff, (wd, ld, md), reps)
        print(f"_device_front merge={merge}: {t * 1e3:8.2f} ms/call")

    # ---- chain program ------------------------------------------------------
    es, stats3 = E._device_front(
        didx, wd, ld, md, S0=S0, S=cfg.max_seeds, M=M, front=cfg.front,
        n_ext=n_ext, merge=cfg.merge, nf_mult=cfg.nf_mult)
    jax.block_until_ready((es, stats3))
    is_str2 = jax.device_put(
        np.concatenate([prep["is_str"], prep["is_str"]]))
    for K in (8, 32):
        cf = lambda s3, e, i2, k=K: E._chain_body_fused(s3, e, i2, K=k)
        t = dev_time(cf, (stats3, es, is_str2), reps)
        print(f"_chain_body_fused K={K:<3}: {t * 1e3:8.2f} ms/call")

    # ---- DP program ----------------------------------------------------------
    rng = np.random.default_rng(0)
    CH = cfg.dp_chunk
    qc = jax.device_put(rng.integers(0, 4, (CH, 96), dtype=np.int32))
    tc = jax.device_put(rng.integers(0, 4, (CH, 128), dtype=np.int32))
    ql = jax.device_put(np.full(CH, 80, np.int32))
    tl = jax.device_put(np.full(CH, 110, np.int32))
    jax.block_until_ready((qc, tc, ql, tl))
    dpf = lambda a, b, c, d: E._device_dp_pallas(
        a, c, b, d, params=eng.dp_params, W=128, interpret=False)
    t = dev_time(dpf, (qc, tc, ql, tl), reps)
    print(f"_device_dp_pallas 2048x(96,128): {t * 1e3:8.2f} ms/call")

    # ---- end-to-end single-process rate (context) ---------------------------
    n_batches = min(8, len(seqs) // B)
    eng.align_batch(seqs[:B], oris[:B])
    t0 = time.perf_counter()
    n_done = 0
    stream = ((seqs[b * B:(b + 1) * B], oris[:B])
              for b in range(1, n_batches))
    for _ in eng.align_stream(stream):
        n_done += B
    dt = time.perf_counter() - t0
    print(f"align_stream          : {n_done / dt:8.0f} reads/s "
          f"({dt / (n_batches - 1) * 1e3:.0f} ms/batch)")
    print("prof:", {k: round(v / (n_batches - 1), 4)
                    for k, v in sorted(eng.prof.items())})


if __name__ == "__main__":
    main()
