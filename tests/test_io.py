import io
import os

import numpy as np

from pansvr_tpu.io.fasta import Faidx, read_fasta, write_fasta
from pansvr_tpu.io.vcf import VCFReader, minimal_header, parse_vcf_line
from pansvr_tpu.utils.simulate import random_genome


def test_fasta_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    seqs = random_genome(rng, {"chrA": 345, "chrB": 70, "chrC": 69})
    p = str(tmp_path / "t.fa")
    write_fasta(p, seqs.items())
    back = read_fasta(p)
    assert back == seqs


def test_faidx_fetch(tmp_path):
    rng = np.random.default_rng(2)
    seqs = random_genome(rng, {"c1": 1000, "c2": 500})
    p = str(tmp_path / "g.fa")
    write_fasta(p, seqs.items(), width=60)
    fx = Faidx(p)
    assert fx.seq_len("c1") == 1000
    assert fx.fetch("c1", 0, 60) == seqs["c1"][:60]
    assert fx.fetch("c1", 59, 121) == seqs["c1"][59:121]
    assert fx.fetch("c2", 490, 600) == seqs["c2"][490:]
    assert fx.fetch("c1", -5, 10) == seqs["c1"][:10]
    # .fai written and reusable
    assert os.path.exists(p + ".fai")
    fx2 = Faidx(p)
    assert fx2.fetch("c1", 123, 456) == seqs["c1"][123:456]


def test_vcf_parse_rlen():
    r = parse_vcf_line("chr1\t100\tsv1\tACGTACGT\tA\t.\tPASS\tSVTYPE=DEL;END=107;SVLEN=-7\n")
    assert r.pos0 == 99
    assert r.rlen == 107 - 99 == 8
    assert r.sv_type == "DEL"
    assert r.sv_len == -7
    r2 = parse_vcf_line("chr1\t100\t.\tACG\tA\t.\t.\t.\n")
    assert r2.rlen == 3
    assert r2.sv_type is None


def test_vcf_reader_writer(tmp_path):
    p = str(tmp_path / "t.vcf")
    with open(p, "w") as fh:
        for line in minimal_header([("chr1", 1000)]):
            fh.write(line + "\n")
        fh.write("chr1\t10\tid1\tAC\tA\t.\tPASS\tSVTYPE=DEL;END=11\n")
        fh.write("chr1\t20\tid2\tA\tACCC\t.\tPASS\tSVTYPE=INS\n")
    with VCFReader(p) as rd:
        assert rd.contigs == [("chr1", 1000)]
        recs = list(rd)
    assert [r.id for r in recs] == ["id1", "id2"]
    assert recs[1].alts == ["ACCC"]
    # round-trip through to_line
    assert parse_vcf_line(recs[0].to_line()).info == recs[0].info
