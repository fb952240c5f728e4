"""BCF reader golden parity: a text VCF converted to binary BCF by the
reference's own vendored htslib (tools/vcf2bcf.c linking
/tmp/refbuild/Release/src/htslib) must decode to field-identical
records through io.vcf.VCFReader — the same unified-reader contract
the reference gets from htslib (src/clib/vcf_file.h:25-36)."""

import os
import subprocess

import pytest

VCF2BCF = "/tmp/refbuild/vcf2bcf"


@pytest.fixture(scope="session")
def vcf2bcf():
    if not os.path.exists(VCF2BCF):
        pytest.skip("vcf2bcf not built (run tools/build_reference.sh)")
    return VCF2BCF


def _make_world(tmp_path):
    from pansvr_tpu.io.vcf import VCFWriter, minimal_header
    from pansvr_tpu.utils.simulate import make_dataset

    ds = make_dataset(seed=77, n_sv=24, n_pairs=100,
                      types=("DEL", "INS", "DUP", "INV"),
                      chrom_lengths={"chr1": 300_000, "chr2": 200_000})
    path = str(tmp_path / "svs.vcf")
    hdr = minimal_header([(c, len(s)) for c, s in ds.genome.items()])
    # htslib refuses to ENCODE records whose INFO keys are undeclared
    # (vcf_parse falls back to Type=String with a warning, then
    # bcf_write fails) — declare the sim generator's keys like any
    # real SV call set does
    info_lines = [
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="SV type">',
        '##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="SV length">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="End">',
        '##INFO=<ID=SAMPLE,Number=1,Type=String,Description="Sample">',
    ]
    hdr = hdr[:-1] + info_lines + hdr[-1:]
    w = VCFWriter(path, hdr)
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    return path, ds


def test_bcf_reader_matches_text(tmp_path, vcf2bcf):
    from pansvr_tpu.io.vcf import VCFReader

    vcf_path, _ = _make_world(tmp_path)
    bcf_path = str(tmp_path / "svs.bcf")
    r = subprocess.run([vcf2bcf, vcf_path, bcf_path], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()

    text = list(VCFReader(vcf_path))
    binary = list(VCFReader(bcf_path))
    assert len(text) == len(binary) and len(text) > 0
    for a, b in zip(text, binary):
        assert (a.chrom, a.pos1, a.ref) == (b.chrom, b.pos1, b.ref)
        assert a.alts == b.alts
        assert a.id == b.id
        # htslib normalizes missing qual/filter; compare semantics
        assert (a.filter in (".", "PASS")) == (b.filter in (".", "PASS"))
        for k in ("SVTYPE", "SVLEN", "END", "SAMPLE"):
            av, bv = a.info.get(k), b.info.get(k)
            assert av == bv, f"INFO {k}: {av!r} != {bv!r} at {a.pos1}"
        assert a.sv_type == b.sv_type
        assert a.sv_len == b.sv_len
        assert a.format == b.format
        assert a.samples == b.samples


def test_anchor_builder_accepts_bcf(tmp_path, vcf2bcf):
    """The anchor stage consumes .bcf exactly like .vcf (component
    rows 12/13: BCF_FILE reads both through htslib)."""
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs
    from pansvr_tpu.io.vcf import VCFReader
    from pansvr_tpu.utils.simulate import DictGenome

    vcf_path, ds = _make_world(tmp_path)
    bcf_path = str(tmp_path / "svs.bcf")
    subprocess.run([vcf2bcf, vcf_path, bcf_path], check=True,
                   capture_output=True)
    ref = DictGenome(ds.genome)
    a = list(build_anchor_contigs(
        list(VCFReader(vcf_path)), ref, AnchorConfig()))
    b = list(build_anchor_contigs(
        list(VCFReader(bcf_path)), ref, AnchorConfig()))
    assert [(c.name, c.seq) for c in a] == [(c.name, c.seq) for c in b]
