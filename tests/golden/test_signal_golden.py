"""fc_signal golden: exact set-equality of emitted signal records vs the
reference binary.

The reference's position-sorted mode cannot be used as an oracle: its
phase-2 cleanup frees SAM_LOAD_BUFF_SIZE (1M) bam1_t slots of a buffer
xcalloc'd with only total_tmp_write_num entries (getSignalRead.cpp:480-483)
— an unconditional out-of-bounds read that segfaults before stdout is
flushed. The name-sorted mode (-N, getSignalRead.cpp:493-518) has no tmp
file and no buggy cleanup, and runs the SAME per-pair classifier + emitter
(all_signal_records_read_pair, getSignalRead.cpp:100-256), so it is the
crash-free oracle: we feed the reference a name-sorted copy of the world
and our extractor the position-sorted original, and require the emitted
record SETS (name/mate -> seq, qual, full comment) to match exactly.

The -U discard is left off on both sides because it reads the sampled
isize bounds, which are input-order-dependent; every other filter rule is
stats-independent (getSignalRead.cpp:174-191). STAT_ comment segments
(order-dependent: first emitted pair only) are stripped before compare.
"""

import io
import os
import re
import subprocess

import pytest

from pansvr_tpu.io.bam import BamReader, BamWriter
from pansvr_tpu.signal.extract import SignalOptions, extract_signal
from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

pytestmark = pytest.mark.skipif(
    not os.environ.get("PANSVR_GOLDEN_SLOW"),
    reason="slow; set PANSVR_GOLDEN_SLOW=1",
)


def _sanitize(comment: str) -> str:
    """Blank the comment fields that are UNINITIALIZED STACK READS in
    the reference for unmapped mates: bam_has_SH_cigar returns without
    writing soft_left/soft_right when n_cigar == 0 (bam_file.c:1031-1034)
    and the caller's locals are uninitialized (getSignalRead.cpp:114-115),
    so the printed soft_left field and the clip>10 FLAGS char of an
    unmapped mate carry garbage. The signal SET is unaffected (an
    unmapped mate fires rule 2 regardless of the garbage clip)."""
    f = comment.split("_")
    # [tid, pos, softL, score, mapq, mmapq, xa, mxa, isize, FLi, FLj, ...]
    if f[9][1] == "Y":   # this mate unmapped
        f[2] = "*"
        f[9] = f[9][:3] + "*"
    if f[10][1] == "Y":  # other mate unmapped
        f[10] = f[10][:3] + "*"
    return "_".join(f)


def _parse_fq(text: str):
    recs = {}
    lines = text.splitlines()
    assert len(lines) % 4 == 0, "truncated FASTQ"
    for k in range(0, len(lines), 4):
        name_comment = lines[k]
        assert name_comment.startswith("@")
        name, comment = name_comment[1:].split(" ", 1)
        comment = re.sub(r"STAT_\d+_\d+_\d+_\d+_", "", comment)
        comment = _sanitize(comment)
        # mate disambiguation via the FLAG_ field (0x40 = read1)
        flag = int(re.search(r"FLAG_(\d+)_", comment).group(1))
        mate = 1 if flag & 0x40 else 2
        key = (name, mate)
        assert key not in recs, f"duplicate {key}"
        recs[key] = (lines[k + 1], lines[k + 3], comment)
    return recs


def test_signal_set_equality(pansvr_bin, tmp_path):
    ds = make_dataset(seed=77, n_sv=24, n_pairs=6000, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 800_000})
    pos_bam = str(tmp_path / "pos.bam")
    write_sim_bam(ds, pos_bam)

    # name-sorted copy: read1 before read2 per pair (the -N contract,
    # getSignalRead.cpp:505-507)
    with BamReader(pos_bam) as rd:
        recs = [r for r in rd
                if not (r.is_secondary or r.is_supplementary)]
        hdr = rd.header
    recs.sort(key=lambda r: (r.name, not r.is_read1))
    name_bam = str(tmp_path / "name.bam")
    with BamWriter(name_bam, hdr) as w:
        for r in recs:
            w.write(r)

    r = subprocess.run(
        [pansvr_bin, "fc_signal", "-N", name_bam],
        capture_output=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-800:]
    ref_recs = _parse_fq(r.stdout.decode())

    out = io.StringIO()
    extract_signal(pos_bam, out,
                   opts=SignalOptions(discard_both_full_match=False))
    our_recs = _parse_fq(out.getvalue())

    assert set(ref_recs) == set(our_recs), (
        f"record sets differ: ref-only={sorted(set(ref_recs) - set(our_recs))[:5]} "
        f"ours-only={sorted(set(our_recs) - set(ref_recs))[:5]}")
    for key in ref_recs:
        assert ref_recs[key] == our_recs[key], (
            f"{key}: ref={ref_recs[key]} ours={our_recs[key]}")
