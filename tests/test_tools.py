"""Smoke coverage for every analysis-toolbox subcommand
(cli/tools.py — the reference's `tools` commands, src/analysis.cpp)."""

import gzip
import os

import numpy as np
import pytest

from pansvr_tpu.cli import tools
from pansvr_tpu.io.fasta import write_fasta
from pansvr_tpu.io.vcf import VCFWriter, minimal_header
from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tools")
    ds = make_dataset(seed=21, n_sv=3, n_pairs=300, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 60_000}, err_rate=0.0)
    genome_fa = str(tmp / "genome.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    bam = str(tmp / "sim.bam")
    write_sim_bam(ds, bam)
    vcf = str(tmp / "svs.vcf")
    w = VCFWriter(vcf, minimal_header(
        [(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    return ds, str(tmp), genome_fa, bam, vcf


def test_bam2fastq(world, tmp_path):
    _, _, _, bam, _ = world
    out = str(tmp_path / "out.fq")
    tools.dispatch("bam2Fastq", [bam, out])
    lines = open(out).read().splitlines()
    assert len(lines) % 4 == 0 and lines[0].startswith("@")


def test_isize_count(world, capsys):
    _, _, _, bam, _ = world
    tools.dispatch("isize_count", [bam])
    out = capsys.readouterr().out.splitlines()
    assert out and all("\t" in l for l in out)


def test_bam_dump(world, tmp_path):
    from pansvr_tpu.io.bam import BamReader

    _, _, _, bam, _ = world
    out = str(tmp_path / "head.bam")
    tools.dispatch("bamDump", [bam, out, "7"])
    with BamReader(out) as rd:
        assert sum(1 for _ in rd) == 7


def test_get_reverse_str(capsys):
    tools.dispatch("getReverseStr", ["ACGTN"])
    assert capsys.readouterr().out.strip() == "NACGT"


def test_ref_split(world, tmp_path, monkeypatch):
    _, _, genome_fa, _, _ = world
    monkeypatch.chdir(tmp_path)
    tools.dispatch("ref_split", [genome_fa])
    assert os.path.exists(tmp_path / "chr1.fa")


def test_vcf_dump(world, tmp_path):
    _, _, _, _, vcf = world
    out = str(tmp_path / "dels.vcf")
    tools.dispatch("vcf_dump", [vcf, out, "ALL", "DEL", "ALL"])
    body = [l for l in open(out) if not l.startswith("#")]
    assert body and all("SVTYPE=DEL" in l for l in body)


def test_random_generate_sv(world, capsys):
    _, _, genome_fa, _, _ = world
    tools.dispatch("randomGenerateSV", [genome_fa, "3", "5"])
    out = capsys.readouterr().out.splitlines()
    assert sum(1 for l in out if not l.startswith("#")) == 5


def test_combine_sort_vcf(world, tmp_path):
    _, _, _, _, vcf = world
    out = str(tmp_path / "merged.vcf")
    tools.dispatch("combine_sort_vcf", [out, vcf, vcf])
    body = [l for l in open(out) if not l.startswith("#")]
    pos = [int(l.split("\t")[1]) for l in body]
    assert pos == sorted(pos) and len(body) >= 2


def test_gz_head(tmp_path, capsys):
    p = str(tmp_path / "x.gz")
    with gzip.open(p, "wb") as fh:
        fh.write(b"HELLOWORLD")
    tools.dispatch("gz_head", [p, "5", "2"])
    assert capsys.readouterr().out == "LLOWO"


def test_read_acgt_analysis(world, tmp_path, capsys):
    _, _, _, bam, _ = world
    fq = str(tmp_path / "r.fq")
    tools.dispatch("bam2Fastq", [bam, fq])
    tools.dispatch("read_ACGT_analysis", [fq])
    out = dict(l.split("\t") for l in capsys.readouterr().out.splitlines())
    assert int(out["A"]) > 0 and set(out) == set("ACGTN")


def test_vcf_compare_tool(world, capsys):
    _, _, _, _, vcf = world
    tools.dispatch("vcf_compare", [vcf, vcf])
    out = capsys.readouterr().out
    assert "recall" in out.lower() or "RECALL" in out
