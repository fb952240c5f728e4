"""Wall-clock of stage fc_signal: ours (position-sorted BAM, the
pipeline's real input) vs the reference binary in its crash-free
name-sorted mode (-N; the pos-sorted mode's phase-2 cleanup segfaults,
see tests/golden/test_signal_golden.py). Both sides parse the same
records and run the same 7-rule classifier + FASTQ render
(getSignalRead.cpp:100-256), so the comparison is stage-equal.

Usage: python tools/measure_signal.py [n_pairs] [reps]
"""

import io
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pansvr_tpu.io.bam import BamReader, BamWriter
from pansvr_tpu.signal.extract import SignalOptions, extract_signal
from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

REF_BIN = "/tmp/refbuild/Release/panSVR"


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # cache key covers every generator parameter (a bare n_pairs key kept
    # benchmarking stale worlds after make_dataset recipe edits)
    params = "seed7_sv50_DEL-INS_chr1-2M_v1"
    work = f"/tmp/pansvr_signal_world_{n_pairs}_{params}"
    pos_bam = f"{work}/pos.bam"
    name_bam = f"{work}/name.bam"
    if not os.path.exists(f"{work}/.done"):
        os.makedirs(work, exist_ok=True)
        ds = make_dataset(seed=7, n_sv=50, n_pairs=n_pairs,
                          types=("DEL", "INS"),
                          chrom_lengths={"chr1": 2_000_000})
        write_sim_bam(ds, pos_bam)
        with BamReader(pos_bam) as rd:
            recs = [r for r in rd
                    if not (r.is_secondary or r.is_supplementary)]
            hdr = rd.header
        recs.sort(key=lambda r: (r.name, not r.is_read1))
        with BamWriter(name_bam, hdr) as w:
            for r in recs:
                w.write(r)
        open(f"{work}/.done", "w").write("ok")

    ours = []
    for _ in range(reps):
        out = io.StringIO()
        t0 = time.perf_counter()
        extract_signal(pos_bam, out,
                       opts=SignalOptions(discard_both_full_match=False))
        ours.append(time.perf_counter() - t0)
        n_lines = out.getvalue().count("\n")
    print(f"ours:      {sorted(ours)[reps // 2]:.3f} s "
          f"(runs: {[f'{t:.3f}' for t in ours]}; {n_lines // 4} records)")

    if os.path.exists(REF_BIN):
        ref = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = subprocess.run([REF_BIN, "fc_signal", "-N", name_bam],
                               capture_output=True, cwd=work)
            ref.append(time.perf_counter() - t0)
        nref = r.stdout.count(b"\n")
        print(f"reference: {sorted(ref)[reps // 2]:.3f} s "
              f"(runs: {[f'{t:.3f}' for t in ref]}; {nref // 4} records, "
              f"rc={r.returncode})")
    else:
        print("reference binary missing (tools/build_reference.sh)")


if __name__ == "__main__":
    main()
