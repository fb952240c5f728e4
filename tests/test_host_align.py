"""Host aligner end-to-end on synthetic SV data: reads simulated from the
ALT haplotype must realign onto their SV anchor contigs with high scores,
correct genome positions, and clean CIGARs."""

import numpy as np
import pytest

from pansvr_tpu.align.host_align import (
    AlignParams,
    FORWARD,
    REVERSE,
    HostAligner,
    OriResult,
    PEScorer,
    reverse_merge_cigar,
)
from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
from pansvr_tpu.index.builder import build_index
from pansvr_tpu.utils import dna
from pansvr_tpu.utils.simulate import DictGenome, make_dataset


@pytest.fixture(scope="module")
def setup():
    ds = make_dataset(
        seed=21, n_sv=4, n_pairs=60, types=("DEL", "INS"),
        chrom_lengths={"chr1": 120_000},
    )
    contigs = list(
        build_anchor_contigs(ds.vcf_records, DictGenome(ds.genome), AnchorConfig())
    )
    idx = build_index([(c.name, c.seq) for c in contigs], first_level_bases=11)
    aligner = HostAligner(idx, ori_chrom_names=list(ds.genome))
    return ds, contigs, idx, aligner


def _unmapped_ori():
    return OriResult(unmapped=True)


def test_perfect_read_aligns(setup):
    ds, contigs, idx, aligner = setup
    # a read copied straight from an anchor contig must align full-score
    c = contigs[0]
    read = c.seq[300:450]
    st = aligner.align_read(read, _unmapped_ori())
    assert st.results, "no alignment for exact anchor substring"
    r = st.results[0]
    assert r.align_score == len(read) * 2
    assert r.direction == FORWARD
    assert r.cigar == [("M", 150)]
    assert r.sv_id == 0
    # genome position: offset 300 in the contig window starting at st_pos-1
    assert r.ref_bg == c.st_pos - 1 + 300


def test_revcomp_read_aligns(setup):
    ds, contigs, idx, aligner = setup
    c = contigs[1]
    read = dna.revcomp(c.seq[200:350])
    st = aligner.align_read(read, _unmapped_ori())
    assert st.results
    r = st.results[0]
    assert r.direction == REVERSE
    assert r.align_score == 150 * 2
    assert r.ref_bg == c.st_pos - 1 + 200


def test_read_with_mismatches(setup):
    ds, contigs, idx, aligner = setup
    c = contigs[2]
    raw = c.seq[100:250]
    codes = dna.encode(raw)
    codes[40] = (codes[40] + 1) % 4
    codes[90] = (codes[90] + 2) % 4
    read = dna.decode(codes)
    st = aligner.align_read(read, _unmapped_ori())
    assert st.results
    r = st.results[0]
    assert r.align_score == 150 * 2 - 2 * (2 + 12)
    assert r.cigar == [("M", 150)]


def test_read_spanning_deletion_breakpoint(setup):
    ds, contigs, idx, aligner = setup
    del_contigs = [c for c in contigs if c.sv_type == "DEL"]
    c = del_contigs[0]
    # read across the DEL breakpoint (bp at offset ~edge_len in the contig):
    # on the contig it is contiguous -> should align as pure M
    bp = 501
    read = c.seq[bp - 75 : bp + 75]
    st = aligner.align_read(read, _unmapped_ori())
    assert st.results
    r = st.results[0]
    assert r.cigar == [("M", 150)]
    assert r.align_score == 150 * 2
    assert aligner.sv_info[r.sv_id].sv_type == "DEL"


def test_simulated_alt_reads_realign(setup):
    ds, contigs, idx, aligner = setup
    alt_reads = [rd for rd in ds.reads if rd.from_alt][:30]
    n_aligned = 0
    for rd in alt_reads:
        st1 = aligner.align_read(rd.seq1, _unmapped_ori())
        st2 = aligner.align_read(rd.seq2, _unmapped_ori())
        if st1.results or st2.results:
            n_aligned += 1
    # alt-haplotype pairs are drawn from +-800 bp around SVs but anchors
    # cover only +-500 bp, so edge pairs legitimately miss; the majority
    # must still hit their anchor contigs
    assert n_aligned >= len(alt_reads) * 0.6, f"only {n_aligned}/{len(alt_reads)}"


def test_pe_pairing_prefers_proper_pairs(setup):
    ds, contigs, idx, aligner = setup
    c = contigs[0]
    r1 = c.seq[250:400]
    r2 = dna.revcomp(c.seq[500:650])
    st1 = aligner.align_read(r1, _unmapped_ori())
    st2 = aligner.align_read(r2, _unmapped_ori())
    assert st1.results and st2.results
    ps = PEScorer(aligner, max_isize=600, min_isize=200, normal_read_len=150)
    pr = ps.pair(st1, st2)
    assert pr.gain_better
    assert pr.proper_mated
    assert pr.max_1 is st1.results[0]
    assert pr.max_2 is st2.results[0]
    # unpaired score = sum - 60; paired keeps the full sum
    assert pr.max_score == st1.results[0].align_score + st2.results[0].align_score


def test_full_score_ori_refused(setup):
    ds, contigs, idx, aligner = setup
    read = contigs[0].seq[300:450]
    ori = OriResult(chr_id=0, align_score=300, unmapped=False)
    st = aligner.align_read(read, ori)
    assert st.results == []  # refused: ori already full score


def test_reverse_merge_cigar():
    # pieces pushed right-to-left are reversed and merged
    tmp = [("M", 50), ("M", 30), ("I", 5), ("M", 15)]
    assert reverse_merge_cigar(tmp, 100) == [("M", 15), ("I", 5), ("M", 80)]
    # negative deletion folds into an adjacent D (try_merge D-branch:
    # size -= cp.size lengthens the deletion)
    tmp = [("M", 60), ("D", -10), ("D", 20), ("M", 40)]
    assert reverse_merge_cigar(tmp, 100) == [("M", 40), ("D", 30), ("M", 60)]
    # wrong total length -> None
    assert reverse_merge_cigar([("M", 10)], 100) is None
