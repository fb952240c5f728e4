"""Round-4 front decomposition on the REAL bench world signal reads:
what the production fused program (compacted front + merge + chain)
costs per batch, split probe / post-probe, plus the measured active-row
fraction that bounds a host-side prescreen win.

Usage: python tools/profile_r4.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pansvr_tpu.utils.jaxcache import enable_cache

enable_cache()

import jax
import numpy as np


def _csum(out):
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(out)
    return sum(l.astype(jnp.int32).sum() for l in leaves
               if hasattr(l, "astype"))


def dev_time(fn, args, reps=5):
    """block_until_ready does not reliably wait on the axon backend
    (2026-08-20), so completion is forced by fetching a SCALAR checksum
    of every output (reduced inside the jitted program — fetching the
    raw outputs would time the d2h copy, not the compute). One 24 ms
    dispatch+fetch RTT rides on every sample; subtract _rtt()."""
    fc = jax.jit(lambda *a: _csum(fn(*a)))
    _ = np.asarray(fc(*args))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fc(*args))
        best.append(time.perf_counter() - t0)
    return float(np.median(best))


def rtt(reps=5):
    f = jax.jit(lambda x: x + 1)
    xd = jax.device_put(np.int32(0))
    _ = np.asarray(f(xd))
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f(xd))
        best.append(time.perf_counter() - t0)
    return float(np.median(best))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import bench

    from pansvr_tpu.align import engine as E
    from pansvr_tpu.align.engine import AlignEngine, EngineConfig
    from pansvr_tpu.pipeline import read_signal_fastq
    from pansvr_tpu.align import native_glue as ng
    from pansvr_tpu.ops.seeding import seed_reads_flat
    import pickle

    work = bench.build_bench_world()
    with open(os.path.join(work, "rdbg.pkl"), "rb") as fh:
        idx = pickle.load(fh)
    cfg = EngineConfig()
    if os.environ.get("PANSVR_FRONT"):
        cfg.front = os.environ["PANSVR_FRONT"]
    eng = AlignEngine(idx, config=cfg)
    records = list(read_signal_fastq(f"{work}/signal.fq"))
    B = 8192
    chunk = records[:B]
    comments = [p[3] for p in chunk]
    oris = ng.parse_comments(comments)
    seqs = [p[1] for p in chunk]
    prep = eng._prep_batch(seqs, oris)
    words, lens2, mask2 = prep["words"], prep["lens2"], prep["mask2"]
    S0, L = prep["S0"], prep["L"]
    n_ext = max(9, -(-(L - 20) // 16))
    M = max(cfg.mem_slots, (S0 + 1 + 15) // 16 * 16)
    n_pad = prep["n_pad"]
    compact = (2 * n_pad) // cfg.compact_div
    print(f"B={B} n_pad={n_pad} rows={2*n_pad} S0={S0} L={L} NE={n_ext} "
          f"M={M} compact={compact} n_active={len(prep['active'])}")

    t_rtt = rtt()
    print(f"dispatch+fetch RTT: {t_rtt*1e3:.2f} ms (subtract from rows)")
    didx = eng.didx
    wd = jax.device_put(words)
    ld = jax.device_put(lens2)
    md = jax.device_put(mask2)
    i2 = jax.device_put(
        np.concatenate([prep["is_str"], prep["is_str"]]))
    jax.block_until_ready((wd, ld, md, i2))

    # production fused program
    K = 8
    def fused(w, l, m, s):
        es, stats3, rid, buf = E._device_front_chain(
            didx, w, l, m, s, S0=S0, S=cfg.max_seeds, M=M, front=cfg.front,
            n_ext=n_ext, nf_mult=cfg.nf_mult, K=K,
            compact=compact)
        return buf
    t_full = dev_time(fused, (wd, ld, md, i2), reps)
    print(f"fused front+merge+chain (compact={compact}): "
          f"{t_full*1e3:8.2f} ms/batch")

    # probe-only at full rows
    from pansvr_tpu.align.engine import _FRONT_PROBE
    probe_kind = _FRONT_PROBE.get(cfg.front, "bisect")
    print(f"front={cfg.front} probe={probe_kind}")
    probe = jax.jit(lambda w, l, m: seed_reads_flat(
        didx, w, l, m, S0=S0, M=cfg.max_seeds, n_ext_steps=n_ext,
        nf_mult=cfg.nf_mult, probe=probe_kind, stop_after="probe"))
    t_probe = dev_time(probe, (wd, ld, md), reps)
    print(f"probe-only (full {2*n_pad} rows):   {t_probe*1e3:8.2f} ms")

    # active stats
    found, count, left = probe(wd, ld, md)
    found = np.asarray(found)
    act = found.any(axis=1)
    n_act_rows = int(act.sum())
    per_read = act[:n_pad] | act[n_pad:]
    print(f"rows with >=1 kmer hit: {n_act_rows}/{2*n_pad} "
          f"({100.0*n_act_rows/(2*n_pad):.1f}%); reads with any hit: "
          f"{int(per_read.sum())}/{n_pad}")

    # front (seed only, compacted) without merge/chain
    def seed_only(w, l, m):
        sb, rid, ob = seed_reads_flat(
            didx, w, l, m, S0=S0, M=M, n_ext_steps=n_ext,
            nf_mult=cfg.nf_mult, probe=probe_kind, compact_rows=compact)
        return sb.uid, sb.valid, rid, ob
    t_seed = dev_time(jax.jit(seed_only), (wd, ld, md), reps)
    print(f"seed front compacted:               {t_seed*1e3:8.2f} ms")

    # merge only (approx: fused minus others come out in the wash)
    def front_merge(w, l, m):
        es, stats3, rid = E._device_front(
            didx, w, l, m, S0=S0, S=cfg.max_seeds, M=M, front=cfg.front,
            n_ext=n_ext, nf_mult=cfg.nf_mult,
            compact=compact)
        return es.ref_begin, stats3
    t_fm = dev_time(jax.jit(front_merge), (wd, ld, md), reps)
    print(f"front+merge compacted:              {t_fm*1e3:8.2f} ms")
    print(f"=> merge ~{(t_fm-t_seed)*1e3:.2f} ms, "
          f"chain+fuse ~{(t_full-t_fm)*1e3:.2f} ms, "
          f"post-probe ~{(t_seed-t_probe)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
