"""Full pipeline end-to-end: simulated genome + SVs + reads -> final VCF.

The round-1 north-star slice: planted deletions and insertions must come
back as PASS records at (near) the planted positions."""

import os

import numpy as np
import pytest

from pansvr_tpu.io.fasta import write_fasta
from pansvr_tpu.io.vcf import VCFReader, VCFWriter, minimal_header
from pansvr_tpu.pipeline import PipelineConfig, run_pipeline
from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    ds = make_dataset(
        seed=77, n_sv=4, n_pairs=1600, types=("DEL", "INS"),
        chrom_lengths={"chr1": 200_000}, err_rate=0.0,
    )
    genome_fa = str(tmp / "genome.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    vcf = str(tmp / "svs.vcf")
    w = VCFWriter(vcf, minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    bam = str(tmp / "sim.bam")
    write_sim_bam(ds, bam)

    out_vcf = run_pipeline(
        vcf, genome_fa, bam, str(tmp / "work"),
        PipelineConfig(first_level_bases=11),
    )
    with VCFReader(out_vcf) as rd:
        records = list(rd)
    return ds, records, str(tmp / "work")


def test_pipeline_produces_calls(pipeline_result):
    ds, records, work = pipeline_result
    assert len(records) >= 1, "pipeline produced no VCF records"
    # intermediate artifacts exist (stage file contracts)
    for f in ("anchors.fa", "signal.fq", "status.txt", "realigned.bam"):
        assert os.path.exists(os.path.join(work, f))


def test_planted_svs_recovered(pipeline_result):
    ds, records, work = pipeline_result
    hits = 0
    for sv in ds.svs:
        for rec in records:
            if (
                rec.chrom == sv.chrom
                and abs(rec.pos1 - sv.pos1) <= 40
                and rec.sv_type == sv.sv_type
            ):
                hits += 1
                break
    # with clean 30x-ish simulated data most planted SVs must come back
    assert hits >= len(ds.svs) * 0.5, (
        f"only {hits}/{len(ds.svs)} planted SVs recovered: "
        f"{[(r.chrom, r.pos1, r.sv_type, r.filter) for r in records]}"
    )


def test_sv_lengths_reasonable(pipeline_result):
    ds, records, work = pipeline_result
    for rec in records:
        if rec.sv_type == "DEL":
            assert len(rec.ref) > len(rec.alts[0])
        elif rec.sv_type == "INS":
            assert len(rec.alts[0]) > len(rec.ref)
