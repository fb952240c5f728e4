import subprocess
import os

import numpy as np
import pytest

from pansvr_tpu.io.bam import (
    BamHeader,
    BamReader,
    BamRecord,
    BamWriter,
    cigar_adjust,
)
from pansvr_tpu.io.bgzf import BGZFReader, BGZFWriter


def _mk_header():
    names = ["chr1", "chr2"]
    lens = [100000, 50000]
    text = "@HD\tVN:1.6\tSO:unsorted\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in zip(names, lens)
    )
    return BamHeader(text=text, ref_names=names, ref_lens=lens)


def _mk_records():
    return [
        BamRecord(
            name="r1", flag=99, tid=0, pos=1000, mapq=60,
            cigar=[("S", 10), ("M", 130), ("I", 5), ("M", 5)],
            mtid=0, mpos=1400, isize=550, seq="ACGT" * 37 + "AC",
            qual="I" * 150,
            tags=[("AS", "i", 280), ("SV", "Z", "3_0_446371_1108_INS_x"),
                  ("XX", "f", 1.5), ("OA", "Z", "0,99,0,60,M;")],
        ),
        BamRecord(
            name="r2", flag=147, tid=1, pos=2000, mapq=0,
            cigar=[("M", 150)], mtid=1, mpos=1600, isize=-550,
            seq="GGCC" * 37 + "GG", qual="#" * 150,
            tags=[("NM", "i", 3)],
        ),
        BamRecord(name="unmapped", flag=4 | 8, seq="ACGTACGT", qual="IIIIIIII"),
    ]


def test_bgzf_roundtrip(tmp_path):
    p = str(tmp_path / "t.bgzf")
    data = os.urandom(200_000)
    with BGZFWriter(p) as w:
        w.write(data)
    r = BGZFReader(p)
    assert r.read_all() == data
    # readable by stock gzip too (BGZF is standard multi-member gzip)
    import gzip
    assert gzip.open(p, "rb").read() == data


def test_bam_roundtrip(tmp_path):
    p = str(tmp_path / "t.bam")
    hdr = _mk_header()
    recs = _mk_records()
    with BamWriter(p, hdr) as w:
        for r in recs:
            w.write(r)
    rd = BamReader(p)
    assert rd.header.ref_names == hdr.ref_names
    assert rd.header.ref_lens == hdr.ref_lens
    back = list(rd)
    assert len(back) == len(recs)
    for a, b in zip(recs, back):
        assert (a.name, a.flag, a.tid, a.pos, a.mapq) == (b.name, b.flag, b.tid, b.pos, b.mapq)
        assert a.cigar == b.cigar
        assert (a.mtid, a.mpos, a.isize) == (b.mtid, b.mpos, b.isize)
        assert a.seq == b.seq and a.qual == b.qual
        assert b.get_tag("AS") == a.get_tag("AS")
        assert b.get_tag("SV") == a.get_tag("SV")


def test_sam_text_roundtrip():
    hdr = _mk_header()
    r = _mk_records()[0]
    line = r.to_sam(hdr)
    back = BamRecord.from_sam(line, hdr)
    assert back.cigar == r.cigar
    assert back.pos == r.pos
    assert back.get_tag("SV") == r.get_tag("SV")
    assert back.mtid == r.mtid


def test_bam_readable_by_reference_binary(tmp_path):
    bin_ = "/tmp/refbuild/Release/panSVR"
    if not os.path.exists(bin_):
        pytest.skip("reference binary not built")
    p = str(tmp_path / "t.bam")
    with BamWriter(p, _mk_header()) as w:
        for r in _mk_records():
            w.write(r)
    out = str(tmp_path / "o.fq")
    res = subprocess.run(
        [bin_, "tools", "bam2Fastq", p, out],
        capture_output=True, timeout=60,
    )
    assert res.returncode == 0, res.stderr.decode()[:500]
    fq = open(out).read()
    assert "r1" in fq and "ACGT" in fq


def test_cigar_adjust_head():
    # weak head: 3M 2I before a strong 100M
    cig = [("M", 3), ("I", 2), ("M", 100)]
    out, adj = cigar_adjust(cig, delete_small_tail=4, add_blank=False)
    assert out == [("I", 5), ("M", 100)]
    assert adj == 3
    # strong first op: unchanged
    out, adj = cigar_adjust([("M", 100), ("D", 5), ("M", 50)], 4, False)
    assert out == [("M", 100), ("D", 5), ("M", 50)] and adj == 0


def test_cigar_adjust_tail_cumulative():
    # tail rule uses the cumulative weak-M sum (M10 at the end with
    # threshold 15: 10 < 15 -> weak; next M100: 10+100 > 15 -> stable)
    cig = [("M", 100), ("D", 3), ("M", 10)]
    out, adj = cigar_adjust(cig, delete_small_tail=15, add_blank=False)
    assert out == [("M", 100), ("I", 10)]
    assert adj == 0


def test_cigar_adjust_add_blank():
    cig = [("M", 3), ("I", 2), ("M", 100), ("I", 4), ("M", 2)]
    out, adj = cigar_adjust(cig, delete_small_tail=4, add_blank=True)
    assert len(out) == len(cig)  # padded with zero-length ops
    assert out[0] == ("I", 5)
    assert out[1] == ("M", 100)
    assert out[2] == ("I", 6)
    assert out[3][1] == 0 and out[4][1] == 0


def test_external_sort_matches_in_memory(tmp_path):
    """External merge sort must produce the same record order as the
    in-memory sort."""
    import numpy as np

    from pansvr_tpu.io.bai import sort_bam
    from pansvr_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter

    rng = np.random.default_rng(5)
    header = BamHeader.from_sam_text(
        "@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:c1\tLN:100000\n@SQ\tSN:c2\tLN:100000\n"
    )
    path = str(tmp_path / "in.bam")
    with BamWriter(path, header) as w:
        for i in range(500):
            w.write(BamRecord(
                name=f"r{i}", flag=0, tid=int(rng.integers(0, 2)),
                pos=int(rng.integers(0, 100000)), mapq=30,
                cigar=[("M", 50)], mtid=-1, mpos=-1, isize=0,
                seq="A" * 50, qual="I" * 50, tags={},
            ))
    a = str(tmp_path / "mem.bam")
    b = str(tmp_path / "ext.bam")
    sort_bam(path, a)
    sort_bam(path, b, max_records_in_ram=64)
    with BamReader(a) as ra, BamReader(b) as rb:
        la = [(r.tid, r.pos, r.name) for r in ra]
        lb = [(r.tid, r.pos, r.name) for r in rb]
    assert [x[:2] for x in la] == [x[:2] for x in lb]


def test_sv_read_index_matches_full_load(tmp_path):
    """SvReadIndex (bounded-memory loader) returns the same LoadedReads
    as load_reads_by_sv on the same realigned BAM."""
    # reuse any realigned BAM produced by a tiny pipeline run
    import os

    from pansvr_tpu.assembly.sv_call import SvReadIndex, load_reads_by_sv
    from pansvr_tpu.anchor.builder import AnchorContig
    from pansvr_tpu.io.fasta import write_fasta
    from pansvr_tpu.io.vcf import VCFWriter, minimal_header
    from pansvr_tpu.pipeline import PipelineConfig, run_pipeline
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

    ds = make_dataset(seed=99, n_sv=3, n_pairs=600, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 120_000}, err_rate=0.0)
    genome_fa = str(tmp_path / "genome.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    vcf = str(tmp_path / "svs.vcf")
    w = VCFWriter(vcf, minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    bam = str(tmp_path / "sim.bam")
    write_sim_bam(ds, bam)
    run_pipeline(vcf, genome_fa, bam, str(tmp_path / "work"),
                 PipelineConfig(first_level_bases=11))
    realigned = os.path.join(str(tmp_path / "work"), "realigned.bam")

    from pansvr_tpu.io.fasta import read_fasta
    anchors = read_fasta(os.path.join(str(tmp_path / "work"), "anchors.fa"))
    infos = [AnchorContig.parse_name(n) for n in anchors]

    full = load_reads_by_sv(realigned, infos)
    idx = SvReadIndex(realigned, infos)
    assert sorted(full) == idx.sv_ids()
    for sv in idx.sv_ids():
        a = full[sv]
        b = idx.get(sv)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert (x.pos, x.seq, x.score, x.cigar) == \
                (y.pos, y.seq, y.score, y.cigar)
    idx.close()
