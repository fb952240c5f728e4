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


def test_float_vector_eov_terminates(tmp_path, vcf2bcf):
    """Number=A/G float INFO+FORMAT vectors: htslib pads shorter
    vectors with bcf_float_vector_end (0x7F800002, a NaN). The decoder
    must TERMINATE on EOV (not render trailing ',.'), and render '.'
    only for bcf_float_missing (0x7F800001) — the float leg of the
    integer EOV/missing split (htslib vcf.c bcf_fmt_array)."""
    from pansvr_tpu.io.vcf import VCFReader

    vcf_path = str(tmp_path / "f.vcf")
    with open(vcf_path, "w") as fh:
        fh.write("\n".join([
            "##fileformat=VCFv4.2",
            "##contig=<ID=chr1,length=100000>",
            '##INFO=<ID=AF,Number=A,Type=Float,Description="af">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">',
            '##FORMAT=<ID=GL,Number=G,Type=Float,Description="gl">',
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2",
            # 2 ALTs on rec1 vs 1 on rec2: the shared INFO/FORMAT width
            # is the max, so rec2's vectors carry EOV padding in BCF
            "chr1\t100\t.\tA\tC,G\t30\tPASS\tAF=0.5,0.25\tGT:GL\t"
            "0/1:-1.5,0,-2.5,-3,-3.5,-4\t1/2:-2,0,-1,.,-5,-6",
            "chr1\t200\t.\tT\tG\t40\tPASS\tAF=0.125\tGT:GL\t"
            "0/1:-0.5,0,-9\t1/1:-7,0,.",
        ]) + "\n")
    bcf_path = str(tmp_path / "f.bcf")
    r = subprocess.run([vcf2bcf, vcf_path, bcf_path], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    text = list(VCFReader(vcf_path))
    binary = list(VCFReader(bcf_path))
    assert len(binary) == 2
    for a, b in zip(text, binary):
        assert a.info.get("AF") == b.info.get("AF"), (
            a.info.get("AF"), b.info.get("AF"))
        assert a.samples == b.samples, (a.samples, b.samples)
