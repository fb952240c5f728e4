"""On-chip microbench: candidate probe formulations vs the production
bisect. The probe is 53 of the 76 ms fused front (tools/profile_r4.py,
2026-08-20) — this drives the round-4 probe redesign.

Measures, at the bench world's real shapes (B2=16384 rows, S0=29):
  a. production bisect probe (stop_after="probe")
  b. raw gather rates: (Q,) 4-byte, (Q, 2) 8-byte, (Q, 4) 16-byte rows
  c. lax.sort rates at join sizes (Q + n_kmer)
  d. prototype cuckoo-2 probe: two independent 8-byte row gathers

Usage: python tools/probe_ab.py [reps]
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


def dev_time(fn, args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import pickle

    import bench
    from pansvr_tpu.align import native_glue as ng
    from pansvr_tpu.align.engine import AlignEngine, EngineConfig
    from pansvr_tpu.ops.seeding import seed_reads_flat
    from pansvr_tpu.pipeline import read_signal_fastq

    work = bench.build_bench_world()
    with open(os.path.join(work, "rdbg.pkl"), "rb") as fh:
        idx = pickle.load(fh)
    cfg = EngineConfig()
    eng = AlignEngine(idx, config=cfg)
    records = list(read_signal_fastq(f"{work}/signal.fq"))
    B = 8192
    chunk = records[:B]
    oris = ng.parse_comments([p[3] for p in chunk])
    prep = eng._prep_batch([p[1] for p in chunk], oris)
    words, lens2, mask2 = prep["words"], prep["lens2"], prep["mask2"]
    S0, L = prep["S0"], prep["L"]
    n_ext = max(9, -(-(L - 20) // 16))
    didx = eng.didx
    wd, ld, md = map(jax.device_put, (words, lens2, mask2))
    jax.block_until_ready((wd, ld, md))
    B2 = words.shape[0]
    Q = B2 * S0
    NK = didx.n_kmer
    print(f"B2={B2} S0={S0} Q={Q} n_kmer={NK} "
          f"max_bucket_bits={didx.max_bucket_bits} ht_probe={didx.ht_probe}")

    # a. production bisect
    probe = jax.jit(lambda w, l, m: seed_reads_flat(
        didx, w, l, m, S0=S0, M=cfg.max_seeds, n_ext_steps=n_ext,
        nf_mult=cfg.nf_mult, stop_after="probe"))
    t = dev_time(probe, (wd, ld, md), reps)
    print(f"bisect probe (production): {t*1e3:8.2f} ms")

    # b. raw gather rates at Q elements
    rng = np.random.RandomState(0)
    qi = jax.device_put(rng.randint(0, NK, size=Q).astype(np.int32))
    tbl1 = jax.device_put(np.arange(NK, dtype=np.int32))
    tbl2 = jax.device_put(np.zeros((NK, 2), np.int32))
    tbl4 = jax.device_put(np.zeros((NK, 4), np.int32))
    jax.block_until_ready((qi, tbl1, tbl2, tbl4))
    for nm, tb in (("4B", tbl1), ("8B-row", tbl2), ("16B-row", tbl4)):
        f = jax.jit(lambda q, t_: jnp.sum(t_[q]))
        t = dev_time(f, (qi, tb), reps)
        print(f"gather {nm:<7} x{Q}: {t*1e3:8.2f} ms "
              f"({Q/t/1e6:.0f} M gathers/s)")

    # two INDEPENDENT 8B-row gathers (do they pipeline?)
    qi2 = jax.device_put(rng.randint(0, NK, size=Q).astype(np.int32))
    f = jax.jit(lambda a, b, t_: jnp.sum(t_[a]) + jnp.sum(t_[b]))
    t = dev_time(f, (qi, qi2, tbl2), reps)
    print(f"2x independent 8B-row gathers: {t*1e3:8.2f} ms")

    # c. sort rates (join candidate): 1/2-operand sorts at Q + NK
    N = Q + NK
    keys = jax.device_put(rng.randint(0, 1 << 30, size=N).astype(np.int32))
    pay = jax.device_put(np.arange(N, dtype=np.int32))
    jax.block_until_ready((keys, pay))
    f = jax.jit(lambda k: jnp.sort(k))
    t = dev_time(f, (keys,), reps)
    print(f"sort 1-op int32 x{N}: {t*1e3:8.2f} ms")
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    t = dev_time(f, (keys, pay), reps)
    print(f"sort 2-op int32 x{N}: {t*1e3:8.2f} ms")
    keys64 = jax.device_put(
        rng.randint(0, 1 << 60, size=N).astype(np.int64))
    f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
    t = dev_time(f, (keys64, pay), reps)
    print(f"sort 2-op int64 x{N}: {t*1e3:8.2f} ms")

    # cumsum at N
    f = jax.jit(lambda k: jnp.cumsum(k))
    t = dev_time(f, (keys,), reps)
    print(f"cumsum int32 x{N}: {t*1e3:8.2f} ms")

    # d. cuckoo-2 prototype at realistic table size (2^18 x 8B rows)
    HB = max(17, int(np.ceil(np.log2(max(NK * 13 // 10, 2)))))
    size = 1 << HB
    ck = jax.device_put(np.full((size, 2), -1, np.int32))
    h1 = jax.device_put(rng.randint(0, size, size=Q).astype(np.int32))
    h2 = jax.device_put(rng.randint(0, size, size=Q).astype(np.int32))
    chk = jax.device_put(rng.randint(0, 1 << 30, size=Q).astype(np.int32))

    def cuckoo(a, b, c, t_):
        r1 = t_[a]
        r2 = t_[b]
        hit1 = r1[:, 0] == c
        hit2 = r2[:, 0] == c
        pay_ = jnp.where(hit1, r1[:, 1], jnp.where(hit2, r2[:, 1], 0))
        return pay_.sum()

    t = dev_time(jax.jit(cuckoo), (h1, h2, chk, ck), reps)
    print(f"cuckoo-2 probe x{Q} (table 2^{HB}): {t*1e3:8.2f} ms")

    # e. hash_g-free bisect floor: how much of the 53 ms is the two
    # hash_g gathers into the 16.7M-entry table?
    hg = didx.hash_g

    def hashg_only(w, l, m):
        # replicate the window build + two hash_g gathers only
        bc = lambda a_: jax.lax.bitcast_convert_type(a_, jnp.uint32)
        rw_u = bc(w)
        Wr = w.shape[1]
        fl = didx.first_level_bases

        offs_np = np.arange(S0, dtype=np.int32) * 5
        wq = offs_np // 16
        sh = ((offs_np % 16) * 2).astype(np.uint32)
        hi = rw_u[:, np.clip(wq, 0, Wr - 1)]
        lo = rw_u[:, np.clip(wq + 1, 0, Wr - 1)]
        shj = jnp.asarray(sh)[None, :]
        win = (hi << shj) | jnp.where(shj == 0, jnp.uint32(0),
                                      lo >> (jnp.uint32(32) - shj))
        bucket = (win >> jnp.uint32(32 - 2 * fl)).astype(jnp.int32)
        lo0 = hg[jnp.clip(bucket, 0, hg.shape[0] - 2)]
        hi0 = hg[jnp.clip(bucket + 1, 0, hg.shape[0] - 1)]
        return lo0.sum() + hi0.sum()

    t = dev_time(jax.jit(hashg_only), (wd, ld, md), reps)
    print(f"window+2x hash_g gathers only: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
