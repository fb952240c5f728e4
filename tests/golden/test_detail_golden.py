"""fc_sv -D detail-channel golden: the per-read pileup renderings
(output_reads + print_info, SignalAssembly.cpp:200-223,958-990) must be
byte-identical to the reference binary's for every read BOTH sides
render, given the SAME input BAM (the reference's own realigned BAM).

Reads rendered by only one side are admitted by the reference's
rand()-dependent over-depth sampling (read_depth_filter filter 4,
SignalAssembly.cpp:239-241) — our sampling is deterministic, so the
comparison is on the intersection, with a floor on its size."""

import io
import os
import re
import subprocess

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("PANSVR_GOLDEN_SLOW"),
    reason="slow (~2 min); set PANSVR_GOLDEN_SLOW=1",
)

# a rendering line: dash pileup, then "pos P offset O VERDICT qname ..."
_LINE = re.compile(r"^[-ACGTN?]*pos -?\d+ offset -?\d+ \S+ (\S+) ")


def _collect(lines):
    recs = {}
    for line in lines:
        m = _LINE.match(line)
        if not m:
            continue
        qname = m.group(1)
        fir = " FIR " in line
        pos = line.split("pos ", 1)[1].split(" ")[0]
        recs[(qname, fir, pos)] = line.rstrip("\n")
    return recs


def test_detail_channel_parity(tmp_path, pansvr_bin, debga_bin):
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
    from pansvr_tpu.assembly.sv_call import (
        SVRefSequence, SvCallOptions, run_sv_calling)
    from pansvr_tpu.io.bai import build_bai, sort_bam
    from pansvr_tpu.io.fasta import Faidx, write_fasta
    from pansvr_tpu.io.vcf import VCFReader, VCFWriter, minimal_header
    from pansvr_tpu.signal.extract import SignalOptions, extract_signal
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

    W = str(tmp_path)
    ds = make_dataset(seed=555, n_sv=8, n_pairs=4000, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 600_000}, err_rate=0.001)
    write_fasta(f"{W}/genome.fa", ds.genome.items(), width=60)
    w = VCFWriter(f"{W}/svs.vcf",
                  minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    write_sim_bam(ds, f"{W}/sim.bam")
    with VCFReader(f"{W}/svs.vcf") as rd:
        contigs = list(build_anchor_contigs(rd, Faidx(f"{W}/genome.fa"),
                                            AnchorConfig()))
    with open(f"{W}/anchors.fa", "w") as fh:
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

    subprocess.run(
        [pansvr_bin, "fc_aln", "-t", "4", "-o", f"{W}/ref_aln.bam",
         f"{W}/idx/", f"{W}/signal.fq", f"{W}/header.sam"],
        check=True, capture_output=True, timeout=600)
    sort_bam(f"{W}/ref_aln.bam", f"{W}/ref_sorted.bam")
    build_bai(f"{W}/ref_sorted.bam")
    r = subprocess.run(
        [pansvr_bin, "fc_sv", "-D", "-o", f"{W}/ref_result.vcf",
         f"{W}/idx/", f"{W}/ref_sorted.bam", f"{W}/header.sam",
         f"{W}/genome.fa"],
        capture_output=True, timeout=600)
    ref_recs = _collect(r.stderr.decode(errors="replace").splitlines())
    assert len(ref_recs) >= 50, f"only {len(ref_recs)} reference renderings"

    # ours: SAME input BAM, detail channel captured
    sf = SVRefSequence([c.name for c in contigs],
                       {c.name: c.seq for c in contigs},
                       Faidx(f"{W}/genome.fa"), list(ds.genome))
    detail = io.StringIO()
    run_sv_calling(
        f"{W}/ref_sorted.bam", sf,
        SvCallOptions(ave_read_depth=max(stats.ave_read_depth, 1.0),
                      normal_read_len=150, print_detail=True),
        detail_out=detail,
    )
    our_recs = _collect(detail.getvalue().splitlines())

    shared = set(ref_recs) & set(our_recs)
    assert len(shared) >= 0.8 * len(ref_recs), (
        f"only {len(shared)}/{len(ref_recs)} renderings shared "
        f"(ours {len(our_recs)})")
    diffs = [k for k in shared if ref_recs[k] != our_recs[k]]
    assert not diffs, (
        f"{len(diffs)}/{len(shared)} rendering lines differ; first:\n"
        f"REF:  {ref_recs[diffs[0]]}\nOURS: {our_recs[diffs[0]]}")
