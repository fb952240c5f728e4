"""De novo caller on simulated BAMs (no prior VCF): planted SVs should be
rediscovered from clip + discordant-pair evidence alone."""

import numpy as np
import pytest

from pansvr_tpu.assembly.denovo import DeNovoCaller, DeNovoOptions
from pansvr_tpu.io.fasta import Faidx, write_fasta
from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("denovo")
    ds = make_dataset(
        seed=130, n_sv=5, n_pairs=3000, types=("DEL",),
        chrom_lengths={"chr1": 250_000}, err_rate=0.0,
    )
    genome_fa = str(tmp / "genome.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    bam = str(tmp / "sim.bam")
    write_sim_bam(ds, bam)
    caller = DeNovoCaller(Faidx(genome_fa))
    records = caller.call_bam(bam)
    return ds, records


def test_denovo_finds_deletions(world):
    ds, records = world
    assert records, "no de novo calls produced"
    hits = 0
    for sv in ds.svs:
        for rec in records:
            if (rec.chrom == sv.chrom and rec.sv_type == "DEL"
                    and abs(rec.pos1 - sv.pos1) <= 60
                    and abs(abs(rec.sv_len or 0) - sv.length) <= 30):
                hits += 1
                break
    assert hits >= len(ds.svs) * 0.6, (
        f"{hits}/{len(ds.svs)}: "
        f"{[(r.chrom, r.pos1, r.sv_type, r.sv_len) for r in records]}"
    )


def test_denovo_genotypes_reported(world):
    ds, records = world
    for rec in records:
        assert rec.format == "GT:DP"
        gt = rec.samples[0].split(":")[0]
        assert gt in ("0/1", "1/1", "./.")
