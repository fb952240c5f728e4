import io

import numpy as np

from pansvr_tpu.anchor.builder import (
    AnchorConfig,
    AnchorContig,
    build_anchor_contigs,
)
from pansvr_tpu.utils.simulate import DictGenome, make_dataset


def _contigs(records, genome, **cfg_kwargs):
    cfg = AnchorConfig(**cfg_kwargs)
    return list(build_anchor_contigs(records, DictGenome(genome), cfg))


def test_del_contig_structure():
    ds = make_dataset(seed=3, n_sv=6, n_pairs=0, types=("DEL",))
    contigs = _contigs(ds.vcf_records, ds.genome, edge_len=100)
    assert len(contigs) == 6
    for c, sv in zip(contigs, ds.svs):
        # reference arithmetic: P = pos1-1 (htslib pos); window fetched from
        # fetch0 = P-edge-1 (the htslib region off-by-one, see builder.py)
        P = sv.pos1 - 1
        assert c.bp1 == P and c.bp2 == P + len(sv.ref)
        assert c.st_pos == P - 100 and c.ed_pos == P + len(sv.ref) + 100
        seq = ds.genome[sv.chrom]
        f0 = P - 100 - 1
        expect = seq[f0 : f0 + 100] + sv.alt + seq[f0 + 100 + len(sv.ref) : P + len(sv.ref) + 100]
        assert c.seq == expect
        assert c.length == len(c.seq)


def test_ins_contig_length():
    ds = make_dataset(seed=4, n_sv=4, n_pairs=0, types=("INS",))
    contigs = _contigs(ds.vcf_records, ds.genome, edge_len=200)
    for c, sv in zip(contigs, ds.svs):
        # window = [P-edge-1, P+rlen+edge) has rlen+2*edge+1 bases (one extra
        # on the left from the htslib region quirk); rlen consumed by the ALT
        assert c.length == 2 * 200 + 1 + len(sv.alt)
        assert c.sv_type == "INS"
        assert c.end_offset == c.ed_pos - c.st_pos - c.length


def test_name_roundtrip():
    ds = make_dataset(seed=5, n_sv=3, n_pairs=0)
    contigs = _contigs(ds.vcf_records, ds.genome)
    for c in contigs:
        p = AnchorContig.parse_name(c.name)
        assert (p.new_ref_id, p.chrom, p.st_pos, p.length) == (
            c.new_ref_id, c.chrom, c.st_pos, c.length)
        assert (p.sv_type, p.bp1, p.bp2, p.ed_pos, p.vcf_id) == (
            c.sv_type, c.bp1, c.bp2, c.ed_pos, c.vcf_id)


def test_name_roundtrip_underscore_chrom():
    c = AnchorContig(7, "chr1_KI270706v1_random", 100, 1100, "DEL", 600, 650, 1200, "x", "")
    p = AnchorContig.parse_name(c.name)
    assert p.chrom == "chr1_KI270706v1_random"
    assert p.bp1 == 600


def test_filters():
    ds = make_dataset(seed=6, n_sv=6, n_pairs=0, types=("DEL", "INS"))
    recs = ds.vcf_records
    # type filter keeps only DEL
    only_del = _contigs(recs, ds.genome, sv_type="DEL")
    assert all(c.sv_type == "DEL" for c in only_del)
    assert len(only_del) == sum(1 for sv in ds.svs if sv.sv_type == "DEL")
    # min_sv_len filter removes everything when set huge
    assert _contigs(recs, ds.genome, min_sv_len=10_000) == []
    # BND/TRA/INV always dropped
    bnd = recs[0]
    bnd.info["SVTYPE"] = "INV"
    inv_dropped = _contigs([bnd], ds.genome)
    assert inv_dropped == []


def test_fasta_emit_70col():
    ds = make_dataset(seed=7, n_sv=2, n_pairs=0)
    from pansvr_tpu.io.fasta import write_fasta
    contigs = _contigs(ds.vcf_records, ds.genome)
    buf = io.StringIO()
    write_fasta(buf, ((c.name, c.seq) for c in contigs), width=70)
    lines = buf.getvalue().splitlines()
    seq_lines = [l for l in lines if not l.startswith(">")]
    assert all(len(l) <= 70 for l in seq_lines)
    assert sum(len(l) for l in seq_lines) == sum(c.length for c in contigs)
