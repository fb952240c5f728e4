"""Measure index-builder peak RSS + wall-clock on synthetic anchor sets.

The reference contract is <4 GB peak for a whole-genome run (panSVR
README.md:48); the deBGA indexer bounds its pass-1 memory by spilling
k-mers into 256 prefix-bucket files (deBGA_release/src/index_build.c).
This tool builds an anchor-shaped FASTA (overlapping windows over a
random genome, mimicking the heavy duplication of SV anchor sets),
runs our builder in a subprocess, and reports peak RSS.

Usage:
  python tools/measure_index_memory.py [--mbp 24] [--reference]

--reference also times `deBGA index` on the same FASTA when the binary
exists at /tmp/refbuild/deBGA_release/deBGA.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def build_anchor_fasta(path: str, total_mbp: float, seed: int = 7,
                       window: int = 3000, overlap: float = 0.5):
    """Anchor-shaped FASTA: `window`-bp contigs stepped `window*(1-overlap)`
    over a random genome, so ~1/(1-overlap) copies of most k-mers exist
    (SV anchor references duplicate flanks the same way)."""
    total = int(total_mbp * 1e6)
    step = int(window * (1 - overlap))
    genome_len = total * step // window + window
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "w") as fh:
        n = 0
        for st in range(0, genome_len - window, step):
            seq = lut[genome[st : st + window]].tobytes().decode()
            fh.write(f">anchor_{n}\n{seq}\n")
            n += 1
    return n


_CHILD = r"""
import pickle, resource, sys, time
sys.path.insert(0, {repo!r})
from pansvr_tpu.io.fasta import read_fasta
contigs = list(read_fasta({fa!r}).items())
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
t0 = time.perf_counter()
from pansvr_tpu.index.builder import build_index
idx = build_index(contigs, first_level_bases={fl})
wall = time.perf_counter() - t0
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
import json as _json
print("RESULT " + _json.dumps({{
    "wall_s": round(wall, 1), "peak_gb": round(peak / 1e6, 2),
    "base_gb": round(base / 1e6, 2),
    "n_uni": int(idx.n_unitigs), "n_kmer": int(idx.n_kmers)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=24.0)
    ap.add_argument("--fl", default="auto",
                    help="first_level_bases (int or 'auto')")
    ap.add_argument("--reference", action="store_true")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fa = os.path.join(tempfile.gettempdir(),
                      f"idx_mem_anchors_{args.mbp:g}.fa")
    if not os.path.exists(fa):
        n = build_anchor_fasta(fa, args.mbp)
        print(f"[mem] wrote {fa}: {n} contigs, {args.mbp} Mbp",
              file=sys.stderr)

    fl = args.fl if args.fl == "auto" else int(args.fl)
    child = _CHILD.format(repo=repo, fa=fa, fl=repr(fl))
    out = subprocess.run([sys.executable, "-c", child], capture_output=True,
                         text=True)
    print(out.stderr, file=sys.stderr, end="")
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    if not line:
        print(out.stdout, file=sys.stderr)
        sys.exit(1)
    ours = json.loads(line[0][7:])
    print(json.dumps({"ours": ours, "mbp": args.mbp, "fl": args.fl}))

    if args.reference:
        debga = "/tmp/refbuild/deBGA_release/deBGA"
        if not os.path.exists(debga):
            print("[mem] reference deBGA binary missing", file=sys.stderr)
            return
        idx_dir = tempfile.mkdtemp(prefix="debga_idx_")
        t0 = time.time()
        pr = subprocess.Popen([debga, "index", "-k", "22", fa, idx_dir],
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL)
        peak = 0
        while pr.poll() is None:
            try:
                with open(f"/proc/{pr.pid}/status") as st:
                    for ln in st:
                        if ln.startswith("VmRSS:"):
                            peak = max(peak, int(ln.split()[1]))
            except FileNotFoundError:
                break
            time.sleep(0.05)
        wall = time.time() - t0
        print(json.dumps({"reference": {"wall_s": round(wall, 1),
                                        "peak_gb": round(peak / 1e6, 2)}}))
        if not args.keep:
            subprocess.run(["rm", "-rf", idx_dir])


if __name__ == "__main__":
    main()
