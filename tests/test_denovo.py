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
        assert rec.format == "GT:SR"
        gt = rec.samples[0].split(":")[0]
        assert gt in ("0/1", "1/1", "./.")


def test_denovo_classifies_tandem_duplications(tmp_path):
    """Short tandem DUPs must come back typed DUP (insertion sequence
    matching the adjacent reference) with the other-breakpoint INS echo
    suppressed; longer ones may stay clip-truncated INS."""
    from pansvr_tpu.io.fasta import Faidx, write_fasta

    ds = make_dataset(seed=140, n_sv=4, n_pairs=3000, types=("DUP",),
                      chrom_lengths={"chr1": 250_000}, err_rate=0.0)
    genome_fa = str(tmp_path / "genome.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    bam = str(tmp_path / "sim.bam")
    write_sim_bam(ds, bam)
    recs = DeNovoCaller(Faidx(genome_fa)).call_bam(bam)
    dups = [r for r in recs if r.sv_type == "DUP"]
    assert dups, "no DUP-typed calls"
    hits = 0
    for sv in ds.svs:
        for r in dups:
            if abs(r.pos1 - sv.pos1) <= 20 and abs(r.sv_len - sv.length) <= 10:
                hits += 1
                break
    assert hits >= 1
    # every planted DUP has SOME call near a breakpoint (DUP or INS)
    for sv in ds.svs:
        assert any(
            abs(r.pos1 - sv.pos1) <= 80
            or abs(r.pos1 - (sv.pos1 + sv.length)) <= 80
            for r in recs
        ), f"nothing near planted DUP at {sv.pos1}"


def test_denovo_emits_bnd_for_translocations(tmp_path):
    """Inter-chromosomal discordant pairs must surface as paired-breakend
    BND records (the reference's TRA sve type)."""
    import numpy as np

    from pansvr_tpu.assembly.denovo import DeNovoCaller, DeNovoOptions
    from pansvr_tpu.io.bai import sort_bam
    from pansvr_tpu.io.bam import BamHeader, BamRecord, BamWriter
    from pansvr_tpu.io.fasta import Faidx, write_fasta

    rng = np.random.default_rng(5)
    bases = np.array(list("ACGT"))
    g = {c: "".join(rng.choice(bases, size=20_000)) for c in ("chrA", "chrB")}
    write_fasta(str(tmp_path / "g.fa"), g.items(), width=60)
    header = BamHeader.from_sam_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        + "".join(f"@SQ\tSN:{c}\tLN:{len(s)}\n" for c, s in g.items())
    )
    recs = []
    # junction: chrA:5000 -> chrB:8000; six supporting pairs
    for k in range(6):
        pos = 4850 - 7 * k
        seq = g["chrA"][pos : pos + 150]
        recs.append(BamRecord(
            name=f"tra.{k}", flag=0x1 | 0x20 | 0x40, tid=0, pos=pos, mapq=60,
            cigar=[("M", 150)], mtid=1, mpos=8000 + 5 * k, isize=0,
            seq=seq, qual="I" * 150,
        ))
    # concordant background on both chroms
    for k in range(30):
        for tid, c in ((0, "chrA"), (1, "chrB")):
            pos = 200 + 600 * k
            seq = g[c][pos : pos + 150]
            recs.append(BamRecord(
                name=f"bg.{c}.{k}", flag=0x1 | 0x2 | 0x20 | 0x40, tid=tid,
                pos=pos, mapq=60, cigar=[("M", 150)], mtid=tid,
                mpos=pos + 250, isize=400, seq=seq, qual="I" * 150,
            ))
    with BamWriter(str(tmp_path / "t.bam"), header) as w:
        for r in recs:
            w.write(r)
    sort_bam(str(tmp_path / "t.bam"), str(tmp_path / "s.bam"))
    out = DeNovoCaller(Faidx(str(tmp_path / "g.fa")),
                       DeNovoOptions(min_support=3)).call_bam(
        str(tmp_path / "s.bam"))
    bnd = [r for r in out if r.sv_type == "BND"]
    assert bnd, f"no BND calls: {[(r.pos1, r.sv_type) for r in out]}"
    r = bnd[0]
    assert r.chrom == "chrA" and abs(r.pos1 - 5000) <= 60
    assert r.info["CHR2"] == "chrB"
    assert "[chrB:" in r.alts[0] or "]chrB:" in r.alts[0]


def test_denovo_nova3_recall(tmp_path):
    """The nova3 benchmark world: 9 novel DEL/INS at 3% read error must
    ALL be recovered with exact positions and near-exact lengths. Long
    insertions (445/394/269 bp, deeper than any clip tail) require the
    UM leg — unmapped mates carry the only interior coverage — so this
    pins the full-length insertion assembly path."""
    from pansvr_tpu.io.fasta import Faidx, write_fasta

    ds = make_dataset(seed=303, n_sv=9, n_pairs=6000, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 400_000}, err_rate=0.03)
    genome_fa = str(tmp_path / "genome.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    bam = str(tmp_path / "sim.bam")
    write_sim_bam(ds, bam)
    recs = DeNovoCaller(Faidx(genome_fa)).call_bam(bam)
    misses = []
    for sv in ds.svs:
        if not any(
            r.chrom == sv.chrom and abs(r.pos1 - sv.pos1) <= 60
            and r.sv_type in (sv.sv_type, "DUP")
            and abs(abs(r.sv_len or 0) - sv.length) <= max(30, sv.length * 0.15)
            for r in recs
        ):
            misses.append((sv.sv_type, sv.pos1, sv.length))
    assert not misses, (
        f"recall {9 - len(misses)}/9, missed {misses}; calls: "
        + str([(r.sv_type, r.pos1, r.sv_len) for r in recs]))


def test_denovo_finds_inversions(tmp_path):
    """Planted inversions must surface as INV records via the typed
    INV_1/INV_2 signal lists + orientation-aware assembly."""
    from pansvr_tpu.assembly.denovo import DeNovoCaller, DeNovoOptions
    from pansvr_tpu.io.fasta import Faidx, write_fasta
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

    ds = make_dataset(
        seed=131, n_sv=4, n_pairs=4000, types=("INV",),
        chrom_lengths={"chr1": 260_000}, err_rate=0.0,
        min_len=250, max_len=500,
    )
    genome_fa = str(tmp_path / "genome.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    bam = str(tmp_path / "sim.bam")
    write_sim_bam(ds, bam)
    caller = DeNovoCaller(Faidx(genome_fa))
    records = caller.call_bam(bam)
    invs = [r for r in records if r.info.get("SVTYPE") == "INV"]
    hits = 0
    for sv in ds.svs:
        for rec in invs:
            if (rec.chrom == sv.chrom
                    and abs(rec.pos1 - sv.pos1) <= 150
                    and abs(abs(rec.sv_len or 0) - sv.length) <= 150):
                hits += 1
                break
    assert hits >= len(ds.svs) * 0.5, (
        f"{hits}/{len(ds.svs)} inversions recovered; calls: "
        + str([(r.pos1, r.info) for r in invs])
    )
