"""On-chip A/B of engine knobs over the bench world.

Runs align_stream under several EngineConfig variants interleaved
(variant order rotates per trial so tunnel-load swings hit all variants
equally) and prints reads/s + the engine phase profile per variant.

Usage: python tools/ab_engine.py key=val [key=val ...] -- key=val ...
Each "--"-separated group is one variant; keys are EngineConfig fields.
Example: python tools/ab_engine.py front=v5 -- front=v6
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pansvr_tpu.utils.jaxcache import enable_cache

enable_cache()


def parse_variants(argv):
    groups = [[]]
    for a in argv:
        if a == "--":
            groups.append([])
        else:
            groups[-1].append(a)
    out = []
    for g in groups:
        d = {}
        for kv in g:
            k, v = kv.split("=", 1)
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
            d[k] = v
        out.append(d)
    return out


def main():
    variants = parse_variants(sys.argv[1:])
    import bench

    from pansvr_tpu.align.engine import AlignEngine, EngineConfig
    from pansvr_tpu.align.host_align import OriResult

    ds, idx = bench.build_world()
    seqs = []
    for r in ds.reads:
        seqs.append(r.seq1)
        seqs.append(r.seq2)
    oris = [OriResult(unmapped=True)] * len(seqs)
    batch = 8192
    n_batches = len(seqs) // batch

    engines = []
    for d in variants:
        cfg = EngineConfig()
        for k, v in d.items():
            setattr(cfg, k, v)
        engines.append(AlignEngine(idx, config=cfg,
                                   ori_chrom_names=list(ds.genome)))

    # warm-up/compile each variant
    for eng in engines:
        eng.align_batch(seqs[:batch], oris[:batch])

    TRIALS = 3
    rates = [[] for _ in engines]
    for t in range(TRIALS):
        order = [(t + k) % len(engines) for k in range(len(engines))]
        for vi in order:
            eng = engines[vi]
            n_done = 0
            t0 = time.perf_counter()
            stream = (
                (seqs[b * batch: (b + 1) * batch], oris[:batch])
                for b in range(1, n_batches)
            )
            for _ in eng.align_stream(stream):
                n_done += batch
            rates[vi].append(n_done / (time.perf_counter() - t0))

    for vi, (d, eng) in enumerate(zip(variants, engines)):
        rs = sorted(rates[vi])
        med = rs[len(rs) // 2]
        nb = (n_batches - 1) * TRIALS
        prof = {k: (v / nb if k.startswith(("sync", "host", "dp")) else v)
                for k, v in sorted(eng.prof.items())}
        pstr = " ".join(f"{k}={v:.3f}" if isinstance(v, float) else
                        f"{k}={v}" for k, v in prof.items())
        print(f"[{vi}] {d}: median {med:.0f} reads/s "
              f"(runs {[f'{r:.0f}' for r in rs]})")
        print(f"     per-batch: {pstr}")


if __name__ == "__main__":
    main()
