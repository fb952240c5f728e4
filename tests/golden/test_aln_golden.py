"""End-to-end realignment parity vs the reference fc_aln binary: same
anchor reference, same deBGA-index parameters, same signal FASTQ; our
engine's new alignments must reproduce the reference's positions
(modulo its SAM-text POS convention: it prints its 0-based coordinate
into the 1-based column, so parsed positions sit one below ours),
scores, and CIGARs.

Measured on 50k signal reads: 4174/4176 of the reference's new-alignment
records reproduced with exact score+cigar+convention-adjusted position.
This test runs a smaller world to stay fast; gated slow.
"""

import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("PANSVR_GOLDEN_SLOW"),
    reason="slow (~3 min incl. deBGA index); set PANSVR_GOLDEN_SLOW=1",
)


def test_fc_aln_parity(tmp_path, pansvr_bin, debga_bin):
    from pansvr_tpu.align.engine import AlignEngine
    from pansvr_tpu.align.host_align import PEScorer
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
    from pansvr_tpu.index.builder import build_index
    from pansvr_tpu.io.bam import BamReader
    from pansvr_tpu.io.fasta import Faidx, write_fasta
    from pansvr_tpu.io.vcf import VCFWriter, minimal_header
    from pansvr_tpu.pipeline import parse_signal_comment, read_signal_fastq
    from pansvr_tpu.signal.extract import SignalOptions, extract_signal
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

    W = str(tmp_path)
    ds = make_dataset(seed=321, n_sv=16, n_pairs=2500, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 600_000})
    write_fasta(f"{W}/genome.fa", ds.genome.items(), width=60)
    w = VCFWriter(f"{W}/svs.vcf",
                  minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    write_sim_bam(ds, f"{W}/sim.bam")

    with open(f"{W}/anchors.fa", "w") as fh:
        from pansvr_tpu.io.vcf import VCFReader
        with VCFReader(f"{W}/svs.vcf") as rd:
            contigs = list(build_anchor_contigs(rd, Faidx(f"{W}/genome.fa"),
                                                AnchorConfig()))
        write_fasta(fh, ((c.name, c.seq) for c in contigs), width=70)
    os.makedirs(f"{W}/idx", exist_ok=True)
    subprocess.run([debga_bin, "index", "-k", "22", f"{W}/anchors.fa",
                    f"{W}/idx/"], check=True, capture_output=True)
    with open(f"{W}/signal.fq", "w") as fh:
        extract_signal(f"{W}/sim.bam", fh, opts=SignalOptions(
            discard_both_full_match=False, not_using_filter=True))
    with open(f"{W}/header.sam", "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:coordinate\n")
        for c, s in ds.genome.items():
            fh.write(f"@SQ\tSN:{c}\tLN:{len(s)}\n")
    subprocess.run(
        [pansvr_bin, "fc_aln", "-t", "8", "-o", f"{W}/ref_aln.bam",
         f"{W}/idx/", f"{W}/signal.fq", f"{W}/header.sam"],
        check=True, capture_output=True, timeout=600,
    )

    ref_new = {}
    n_tie = 0
    with BamReader(f"{W}/ref_aln.bam") as rd:
        for rec in rd:
            if rec.get_tag("CS") is not None:
                # zero-gain records (AS == the ori score echoed in OS)
                # are decided by the reference's rand() reservoir
                # sampling over equal-score pairings (set_score,
                # read_realignment.hpp:548-557: on a tie the incumbent
                # is replaced with probability 1/max_same) — ours
                # deterministically keeps the original alignment, so
                # the tie class carries no parity signal and is skipped
                if rec.get_tag("AS") <= (rec.get_tag("OS") or 0):
                    n_tie += 1
                    continue
                ref_new[(rec.name, bool(rec.flag & 0x40))] = (
                    rec.pos, rec.get_tag("AS"), rec.cigar_string()
                )
    assert len(ref_new) > 100

    idx = build_index([(c.name, c.seq) for c in contigs],
                      first_level_bases=12)
    eng = AlignEngine(idx, ori_chrom_names=list(ds.genome))
    pe = PEScorer(eng.host, max_isize=600, min_isize=200, normal_read_len=150)
    pairs = list(read_signal_fastq(f"{W}/signal.fq"))
    hit = full = 0
    for i in range(0, len(pairs) - 1, 4096):
        chunk = pairs[i : i + 4096]
        oris = [parse_signal_comment(p[3])[0] for p in chunk]
        states = eng.align_batch([p[1] for p in chunk], oris)
        for k in range(0, len(chunk) - 1, 2):
            pr = pe.pair(states[k], states[k + 1])
            if not pr.gain_better:
                continue
            for is_first, prim in ((True, pr.max_1), (False, pr.max_2)):
                if prim is None or prim.is_ori:
                    continue
                key = (chunk[k][0], is_first)
                if key not in ref_new:
                    continue
                hit += 1
                rpos, ras, rcig = ref_new[key]
                ours_cig = "".join(f"{n}{op}" for op, n in prim.cigar)
                # reference SAM POS convention: parsed pos == ours - 1
                if (prim.ref_bg - 1 == rpos and prim.align_score == ras
                        and ours_cig == rcig):
                    full += 1

    assert hit >= 0.95 * len(ref_new), f"recall {hit}/{len(ref_new)}"
    # exact score+cigar+position parity; the residual gap is rand()-driven
    # tie-breaking in the reference (chain selection, occurrence sampling)
    # on reads with near-equal candidates — ~100% on sparse-SV worlds,
    # ~95% with clustered SVs (measured; see STATUS.md)
    assert full >= 0.90 * hit, f"exact-match {full}/{hit}"


def test_output_ori_parity(tmp_path, pansvr_bin, debga_bin):
    """-p side-channel parity: the reference fc_aln's output_ori.bam vs
    our emit_ori_pair on the same signal FASTQ + index. SVs hidden from
    the VCF leave unexplained pairs so the channel is populated. Records
    keyed (name, read1) must agree on flag, position, and CIGAR
    (read_realignment.cpp:656-718,775-798)."""
    from pansvr_tpu.align.bam_out import emit_ori_pair, min_filter_score
    from pansvr_tpu.align.engine import AlignEngine
    from pansvr_tpu.align.host_align import PEScorer
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
    from pansvr_tpu.index.builder import build_index
    from pansvr_tpu.io.bam import BamHeader, BamReader
    from pansvr_tpu.io.fasta import Faidx, write_fasta
    from pansvr_tpu.io.vcf import VCFReader, VCFWriter, minimal_header
    from pansvr_tpu.pipeline import parse_signal_comment, read_signal_fastq
    from pansvr_tpu.signal.extract import SignalOptions, extract_signal
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

    W = str(tmp_path)
    ds = make_dataset(seed=910, n_sv=8, n_pairs=2500, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 400_000})
    write_fasta(f"{W}/genome.fa", ds.genome.items(), width=60)
    w = VCFWriter(f"{W}/svs.vcf",
                  minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records[: len(ds.vcf_records) // 2]:  # hide half
        w.write(r)
    w.close()
    write_sim_bam(ds, f"{W}/sim.bam")
    with open(f"{W}/anchors.fa", "w") as fh:
        with VCFReader(f"{W}/svs.vcf") as rd:
            contigs = list(build_anchor_contigs(rd, Faidx(f"{W}/genome.fa"),
                                                AnchorConfig()))
        write_fasta(fh, ((c.name, c.seq) for c in contigs), width=70)
    os.makedirs(f"{W}/idx", exist_ok=True)
    subprocess.run([debga_bin, "index", "-k", "22", f"{W}/anchors.fa",
                    f"{W}/idx/"], check=True, capture_output=True)
    with open(f"{W}/signal.fq", "w") as fh:
        extract_signal(f"{W}/sim.bam", fh, opts=SignalOptions(
            discard_both_full_match=False, not_using_filter=True))
    with open(f"{W}/header.sam", "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:coordinate\n")
        for c, s in ds.genome.items():
            fh.write(f"@SQ\tSN:{c}\tLN:{len(s)}\n")
    subprocess.run(
        [pansvr_bin, "fc_aln", "-t", "8", "-o", f"{W}/ref_aln.bam",
         "-p", f"{W}/ref_ori.bam",
         f"{W}/idx/", f"{W}/signal.fq", f"{W}/header.sam"],
        check=True, capture_output=True, timeout=600,
    )
    ref_ori = {}
    with BamReader(f"{W}/ref_ori.bam") as rd:
        for rec in rd:
            ref_ori[(rec.name, bool(rec.flag & 0x40))] = (
                rec.flag, rec.pos, rec.cigar_string()
            )
    assert len(ref_ori) > 20, "reference side-channel unexpectedly empty"

    idx = build_index([(c.name, c.seq) for c in contigs],
                      first_level_bases=12)
    eng = AlignEngine(idx, ori_chrom_names=list(ds.genome))
    pe = PEScorer(eng.host, max_isize=600, min_isize=200, normal_read_len=150)
    header = BamHeader.from_sam_text(open(f"{W}/header.sam").read())
    filt = min_filter_score(150)
    ours = {}
    pairs = list(read_signal_fastq(f"{W}/signal.fq"))
    for i in range(0, len(pairs) - 1, 4096):
        chunk = pairs[i : i + 4096]
        oris = [parse_signal_comment(p[3])[0] for p in chunk]
        states = eng.align_batch([p[1] for p in chunk], oris)
        for k in range(0, len(chunk) - 1, 2):
            pr = pe.pair(states[k], states[k + 1])
            for rec in emit_ori_pair(
                pr, states[k], states[k + 1],
                chunk[k][0], chunk[k][1], chunk[k][2],
                chunk[k + 1][1], chunk[k + 1][2],
                chunk[k][3], chunk[k + 1][3], header, filt,
                list(ds.genome),
            ):
                ours[(rec.name, bool(rec.flag & 0x40))] = (
                    rec.flag, rec.pos, rec.cigar_string()
                )

    common = set(ref_ori) & set(ours)
    assert len(common) >= 0.9 * len(ref_ori), \
        f"recall {len(common)}/{len(ref_ori)}"
    agree = sum(1 for k in common if ref_ori[k] == ours[k])
    assert agree >= 0.98 * len(common), f"field agreement {agree}/{len(common)}"
