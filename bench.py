"""Benchmark: reads realigned per second per chip through the batched
device engine (seeding + chaining + banded DP + CIGAR assembly).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the reference CPU panSVR fc_aln when a
baseline measurement file exists (tools/measure_cpu_baseline.py writes
it); 0.0 until then.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent jit cache: repeated bench runs skip recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pansvr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# the axon sitecustomize imports jax before this module runs, so the env
# vars above are too late on that runtime — enable the cache via config
try:
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pansvr_tpu.utils.jaxcache import enable_cache as _ec

    _ec()
except Exception:
    pass

BASELINE_FILE = "/tmp/pansvr_cpu_baseline.json"
# measured 2026-08-17 by tools/measure_cpu_baseline.py (32-thread CPU
# reference fc_aln); the repo copy survives /tmp wipes between rounds
BASELINE_FALLBACK = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools", "cpu_baseline.json")


def build_world(seed=123, n_sv=64, n_pairs=30_000):
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
    from pansvr_tpu.index.builder import build_index
    from pansvr_tpu.utils.simulate import DictGenome, make_dataset

    ds = make_dataset(
        seed=seed, n_sv=n_sv, n_pairs=n_pairs, types=("DEL", "INS"),
        chrom_lengths={"chr1": 2_000_000},
    )
    contigs = list(
        build_anchor_contigs(ds.vcf_records, DictGenome(ds.genome), AnchorConfig())
    )
    idx = build_index([(c.name, c.seq) for c in contigs], first_level_bases=12)
    return ds, idx


def _wait_for_backend(max_wait_s: float = 1500.0) -> bool:
    """The axon tunnel can be down for stretches (probe in a subprocess:
    a hung backend init would otherwise burn the whole bench timeout).
    Returns True once a trivial device op succeeds."""
    import subprocess

    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np;"
                 "assert int(np.asarray(jax.numpy.arange(8).sum())) == 28"],
                timeout=180, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[bench] TPU backend unavailable, retrying "
              f"({int(time.time() - t0)}s)", file=sys.stderr, flush=True)
        time.sleep(60)
    return False


def main():
    from pansvr_tpu.align.engine import AlignEngine
    from pansvr_tpu.align.host_align import OriResult

    if not _wait_for_backend():
        print("[bench] giving up: TPU backend unreachable", file=sys.stderr)
        sys.exit(1)

    ds, idx = build_world()
    eng = AlignEngine(idx, ori_chrom_names=list(ds.genome))

    seqs = []
    for r in ds.reads:
        seqs.append(r.seq1)
        seqs.append(r.seq2)
    oris = [OriResult(unmapped=True)] * len(seqs)

    # measured on-chip: 3.9k reads/s at B=4096, 5.4k at B=8192,
    # 4.6k at B=16384 (host phases grow superlinearly) -> 8192
    batch = 8192
    n_batches = len(seqs) // batch
    # warm-up/compile on one batch (same shapes as the measured runs)
    eng.align_batch(seqs[:batch], oris[:batch])

    # the TPU is reached over a SHARED tunnel whose load swings run-to-run
    # throughput by +-30%: report the median of three passes
    rates = []
    for _pass in range(3):
        n_done = 0
        t0 = time.time()
        stream = (
            (seqs[b * batch : (b + 1) * batch], oris[:batch])
            for b in range(1, n_batches)
        )
        for _states in eng.align_stream(stream):
            n_done += batch
        rates.append(n_done / (time.time() - t0))
    reads_per_s = sorted(rates)[1]

    vs_baseline = 0.0
    base_path = BASELINE_FILE if os.path.exists(BASELINE_FILE) \
        else BASELINE_FALLBACK
    if os.path.exists(base_path):
        try:
            base = json.load(open(base_path))
            cpu = float(base.get("cpu_reads_per_s_32t", 0))
            if cpu > 0:
                vs_baseline = reads_per_s / cpu
        except Exception:
            pass

    print(json.dumps({
        "metric": "reads_realigned_per_s_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
