"""North-star parity: final VCF vs the reference's full pipeline.

Shared world -> reference binaries run S1 (anchor), deBGA index, and S5
(fc_sv) on the reference's own fc_aln BAM (sorted + indexed by OUR
sorter/BAI builder — interop in itself); our pipeline runs S4+S5 on the
same signal FASTQ. The final call sets must agree at exact positions.

Measured on the 50k-read baseline world: 58/59 reference calls matched,
all 58 position-exact with SVLEN within 5 bp.
"""

import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("PANSVR_GOLDEN_SLOW"),
    reason="slow (~4 min); set PANSVR_GOLDEN_SLOW=1",
)


@pytest.mark.parametrize("types", [("DEL", "INS"), ("DEL", "INS", "DUP")],
                         ids=["del-ins", "del-ins-dup"])
def test_final_vcf_parity(tmp_path, pansvr_bin, debga_bin, types):
    from pansvr_tpu.align.bam_out import emit_pair
    from pansvr_tpu.align.engine import AlignEngine
    from pansvr_tpu.align.host_align import PEScorer
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
    from pansvr_tpu.assembly.sv_call import (
        SVRefSequence,
        SvCallOptions,
        run_sv_calling,
    )
    from pansvr_tpu.index.builder import build_index
    from pansvr_tpu.io.bai import build_bai, sort_bam
    from pansvr_tpu.io.bam import BamHeader, BamWriter
    from pansvr_tpu.io.fasta import Faidx, write_fasta
    from pansvr_tpu.io.vcf import VCFReader, VCFWriter, minimal_header, parse_vcf_line
    from pansvr_tpu.pipeline import parse_signal_comment, read_signal_fastq
    from pansvr_tpu.signal.extract import SignalOptions, extract_signal
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

    W = str(tmp_path)
    # the DUP leg exercises the anchor builder's duplicated-segment
    # special case (get_anchor_ref.hpp:294-325) and the fc_sv DUP
    # verdict paths end to end — every prior golden world was DEL/INS
    ds = make_dataset(seed=777, n_sv=12, n_pairs=6000, types=types,
                      chrom_lengths={"chr1": 800_000}, err_rate=0.001)
    write_fasta(f"{W}/genome.fa", ds.genome.items(), width=60)
    w = VCFWriter(f"{W}/svs.vcf",
                  minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
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
        stats = extract_signal(f"{W}/sim.bam", fh, opts=SignalOptions(
            discard_both_full_match=False, not_using_filter=True))
    with open(f"{W}/header.sam", "w") as fh:
        fh.write("@HD\tVN:1.6\tSO:coordinate\n")
        for c, s in ds.genome.items():
            fh.write(f"@SQ\tSN:{c}\tLN:{len(s)}\n")

    # ---- reference S4 + S5 on its own BAM (our sorter + BAI) ------------
    subprocess.run(
        [pansvr_bin, "fc_aln", "-t", "8", "-o", f"{W}/ref_aln.bam",
         f"{W}/idx/", f"{W}/signal.fq", f"{W}/header.sam"],
        check=True, capture_output=True, timeout=600,
    )
    sort_bam(f"{W}/ref_aln.bam", f"{W}/ref_sorted.bam")
    build_bai(f"{W}/ref_sorted.bam")
    subprocess.run(
        [pansvr_bin, "fc_sv", "-o", f"{W}/ref_result.vcf", f"{W}/idx/",
         f"{W}/ref_sorted.bam", f"{W}/header.sam", f"{W}/genome.fa"],
        capture_output=True, timeout=600,
    )  # exits nonzero on its end-of-chromosome-loop abort; output is complete
    ref_calls = [
        parse_vcf_line(l) for l in open(f"{W}/ref_result.vcf")
        # the reference aborts at its end-of-chromosome loop and can leave
        # a truncated final line; require complete records
        if not l.startswith("#") and l.count("\t") >= 7
    ]
    assert len(ref_calls) >= 5

    # ---- our S4 + S5 ----------------------------------------------------
    idx = build_index([(c.name, c.seq) for c in contigs],
                      first_level_bases=12)
    eng = AlignEngine(idx, ori_chrom_names=list(ds.genome))
    pe = PEScorer(eng.host, max_isize=stats.max_isize or 600,
                  min_isize=stats.min_isize or 200, normal_read_len=150)
    header = BamHeader.from_sam_text(open(f"{W}/header.sam").read())
    pairs = list(read_signal_fastq(f"{W}/signal.fq"))
    writer = BamWriter(f"{W}/our_realigned.bam", header)
    chunksz = 4096
    chunks = [pairs[i : i + chunksz] for i in range(0, len(pairs) - 1, chunksz)]

    def stream():
        for ch in chunks:
            yield ([p[1] for p in ch],
                   [parse_signal_comment(p[3])[0] for p in ch])

    for ch, states in zip(chunks, eng.align_stream(stream())):
        for k in range(0, len(ch) - 1, 2):
            pr = pe.pair(states[k], states[k + 1])
            if not pr.gain_better:
                continue
            for rec in emit_pair(eng.host, pr, states[k], states[k + 1],
                                 ch[k][0], ch[k][1], ch[k][2],
                                 ch[k + 1][1], ch[k + 1][2],
                                 ch[k][3], ch[k + 1][3], header):
                writer.write(rec)
    writer.close()
    sf = SVRefSequence([c.name for c in contigs],
                       {c.name: c.seq for c in contigs},
                       Faidx(f"{W}/genome.fa"), list(ds.genome))
    _, recs = run_sv_calling(
        f"{W}/our_realigned.bam", sf,
        SvCallOptions(ave_read_depth=max(stats.ave_read_depth, 1.0),
                      normal_read_len=150),
    )

    matched = pos_exact = full_exact = 0
    for rr in ref_calls:
        for r in recs:
            if (r.chrom == rr.chrom and abs(r.pos1 - rr.pos1) <= 20
                    and r.sv_type == rr.sv_type):
                matched += 1
                if r.pos1 == rr.pos1:
                    pos_exact += 1
                    if (r.sv_len == rr.sv_len
                            and r.info.get("END") == rr.info.get("END")):
                        full_exact += 1
                break
    assert matched >= 0.9 * len(ref_calls), f"{matched}/{len(ref_calls)}"
    assert pos_exact >= 0.9 * matched, f"pos-exact {pos_exact}/{matched}"
    # SVLEN and END must also match the binary's exactly (the two
    # systematic off-by-ones fixed 2026-08-18 would fail this)
    assert full_exact >= 0.9 * pos_exact, \
        f"pos+len+END exact {full_exact}/{pos_exact}"
