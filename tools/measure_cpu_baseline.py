"""Measure the reference CPU panSVR realignment throughput on synthetic
data, for bench.py's vs_baseline ratio.

Builds a synthetic dataset, produces the anchor reference + deBGA index
with the reference binaries, extracts signal reads with OUR extractor
(format-compatible comments; the reference's own fc_signal segfaults in
its phase-2 unpaired handling on small BAMs), then times the reference
`fc_aln` at several thread counts on the same signal FASTQ our engine is
benchmarked on. Writes /tmp/pansvr_cpu_baseline.json.

Usage: PYTHONPATH=/root/repo python tools/measure_cpu_baseline.py
Requires tools/build_reference.sh to have been run.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PANSVR = "/tmp/refbuild/Release/panSVR"
DEBGA = "/tmp/refbuild/deBGA_release/deBGA"
WORK = "/tmp/pansvr_baseline"
OUT = "/tmp/pansvr_cpu_baseline.json"


def main():
    from bench import build_world
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
    from pansvr_tpu.io.fasta import Faidx, write_fasta
    from pansvr_tpu.io.vcf import VCFWriter, minimal_header
    from pansvr_tpu.signal.extract import SignalOptions, extract_signal
    from pansvr_tpu.utils.simulate import DictGenome, write_sim_bam

    os.makedirs(WORK, exist_ok=True)
    # large read volume so fixed startup (index load) doesn't dominate
    ds, idx = build_world(n_pairs=25_000)
    genome_fa = f"{WORK}/genome.fa"
    write_fasta(genome_fa, ds.genome.items(), width=60)
    vcf = f"{WORK}/svs.vcf"
    w = VCFWriter(vcf, minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    bam = f"{WORK}/sim.bam"
    write_sim_bam(ds, bam)

    # anchor ref + deBGA index via the reference binaries
    for f in (f"{genome_fa}.fai",):
        if os.path.exists(f):
            os.unlink(f)
    with open(f"{WORK}/anchors.fa", "w") as fh:
        subprocess.run([PANSVR, "fc_anchor_ref", genome_fa, vcf],
                       stdout=fh, stderr=subprocess.DEVNULL, check=True)
    idx_dir = f"{WORK}/idx/"
    os.makedirs(idx_dir, exist_ok=True)
    subprocess.run([DEBGA, "index", "-k", "22", f"{WORK}/anchors.fa", idx_dir],
                   check=True, capture_output=True)

    # signal FASTQ with our extractor (dump mode to maximize read volume)
    signal_fq = f"{WORK}/signal.fq"
    with open(signal_fq, "w") as fh:
        extract_signal(bam, fh, opts=SignalOptions(
            discard_both_full_match=False, not_using_filter=True))
    n_reads = sum(1 for _ in open(signal_fq)) // 4
    with open(f"{WORK}/header.sam", "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:coordinate\n")
        for c, s in ds.genome.items():
            fh.write(f"@SQ\tSN:{c}\tLN:{len(s)}\n")

    results = {}
    for threads in (1, 8, 32):
        t0 = time.time()
        res = subprocess.run(
            [PANSVR, "fc_aln", "-t", str(threads),
             "-o", f"{WORK}/aln_t{threads}.bam", idx_dir, signal_fq,
             f"{WORK}/header.sam"],
            capture_output=True, timeout=1800,
        )
        dt = time.time() - t0
        if res.returncode != 0:
            print(f"fc_aln -t {threads} FAILED: {res.stderr.decode()[-400:]}")
            continue
        results[f"cpu_reads_per_s_{threads}t"] = round(n_reads / dt, 1)
        print(f"threads={threads}: {n_reads} reads in {dt:.1f}s "
              f"-> {n_reads/dt:.0f} reads/s")

    results["n_reads"] = n_reads
    with open(OUT, "w") as fh:
        json.dump(results, fh)
    print(f"wrote {OUT}: {results}")


if __name__ == "__main__":
    main()
