"""CRAM interop golden vs the vendored htslib (the reference's own CRAM
stack): htslib-written CRAM (rans4x8 blocks) must decode to the same
records our BamReader sees, and our CramWriter's output must read back
identically through htslib."""

import os
import subprocess

import pytest

from .conftest import PANSVR_BIN

HTSLIB_OBJ_DIR = "/tmp/refbuild/Release/src/htslib"
HTSLIB_INC = "/root/reference/src/htslib"

BAM2CRAM_C = r"""
#include <stdio.h>
#include <string.h>
#include "htslib/sam.h"
#include "htslib/hts.h"

/* usage: shim b2c in out ref.fa   (bam/cram either way by extension)
          shim c2s in out ref.fa   (cram -> sam text) */
int main(int argc, char **argv) {
    if (argc < 5) return 2;
    const char *mode_out = strcmp(argv[1], "c2s") ? "wc" : "w";
    samFile *in = sam_open(argv[2], "r");
    if (!in) { fprintf(stderr, "open in failed\n"); return 1; }
    if (hts_set_fai_filename(in, argv[4]) < 0) return 1;
    samFile *out = sam_open(argv[3], mode_out);
    if (!out) { fprintf(stderr, "open out failed\n"); return 1; }
    if (hts_set_fai_filename(out, argv[4]) < 0) return 1;
    bam_hdr_t *h = sam_hdr_read(in);
    if (!h || sam_hdr_write(out, h) < 0) return 1;
    bam1_t *b = bam_init1();
    int r;
    while ((r = sam_read1(in, h, b)) >= 0)
        if (sam_write1(out, h, b) < 0) return 1;
    bam_destroy1(b);
    sam_close(out);
    sam_close(in);
    return r < -1 ? 1 : 0;
}
"""


@pytest.fixture(scope="module")
def hts_shim(tmp_path_factory, pansvr_bin):
    """Compile the BAM<->CRAM shim against the vendored htslib objects
    (built as part of the reference build)."""
    tmp = tmp_path_factory.mktemp("htsshim")
    src = tmp / "shim.c"
    src.write_text(BAM2CRAM_C)
    objs = [
        os.path.join(d, f)
        for d in (HTSLIB_OBJ_DIR, os.path.join(HTSLIB_OBJ_DIR, "cram"))
        for f in os.listdir(d)
        if f.endswith(".o") and f != "bgzip.o"
    ]
    exe = str(tmp / "shim")
    r = subprocess.run(
        ["gcc", "-o", exe, str(src), f"-I{HTSLIB_INC}"] + objs
        + ["-lz", "-lpthread", "-lm"],
        capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"htslib shim build failed: {r.stderr.decode()[:500]}")
    return exe


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from pansvr_tpu.io.fasta import Faidx, write_fasta
    from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam

    tmp = tmp_path_factory.mktemp("cramworld")
    ds = make_dataset(seed=91, n_sv=4, n_pairs=1500, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 150_000, "chr2": 90_000})
    fa = str(tmp / "genome.fa")
    write_fasta(fa, ds.genome.items(), width=60)
    Faidx(fa)  # writes genome.fa.fai for htslib
    bam = str(tmp / "sim.bam")
    write_sim_bam(ds, bam)
    return ds, fa, bam, tmp


def _same_records(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (x.name, x.flag, x.tid, x.pos, x.mapq, x.cigar, x.mtid,
                x.mpos, x.isize, x.seq, x.qual) == \
            (y.name, y.flag, y.tid, y.pos, y.mapq, y.cigar, y.mtid,
             y.mpos, y.isize, y.seq, y.qual), (x.name, x, y)
        # htslib drops MD/NM when writing CRAM (reference-derivable)
        xt = sorted(t for t in x.tags if t[0] not in ("MD", "NM"))
        yt = sorted(t for t in y.tags if t[0] not in ("MD", "NM"))
        assert xt == yt, x.name


def test_read_htslib_cram(hts_shim, world, tmp_path):
    """htslib writes the CRAM (default profile: rans4x8 + gzip blocks,
    mate-downstream records); our CramReader must reproduce BamReader's
    view of the same data."""
    from pansvr_tpu.io.bam import BamReader
    from pansvr_tpu.io.cram import CramReader
    from pansvr_tpu.io.fasta import Faidx

    ds, fa, bam, tmp = world
    cram = str(tmp_path / "hts.cram")
    r = subprocess.run([hts_shim, "b2c", bam, cram, fa],
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[:800]

    with BamReader(bam) as rd:
        want = list(rd)
    with CramReader(cram, ref=Faidx(fa)) as cr:
        got = list(cr)
    _same_records(want, got)


def test_htslib_reads_our_cram(hts_shim, world, tmp_path):
    """Our CramWriter's output must round-trip through htslib back to
    the original records (htslib c2s -> SAM text comparison)."""
    from pansvr_tpu.io.bam import BamReader
    from pansvr_tpu.io.cram import CramWriter
    from pansvr_tpu.io.fasta import Faidx

    ds, fa, bam, tmp = world
    with BamReader(bam) as rd:
        header = rd.header
        recs = list(rd)
    ours = str(tmp_path / "ours.cram")
    w = CramWriter(ours, header, ref=Faidx(fa))
    for rec in recs:
        w.write(rec)
    w.close()

    sam_out = str(tmp_path / "ours.sam")
    r = subprocess.run([hts_shim, "c2s", ours, sam_out, fa],
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[:800]

    got_lines = [l for l in open(sam_out) if not l.startswith("@")]
    assert len(got_lines) == len(recs)
    for rec, line in zip(recs, got_lines):
        c = line.rstrip("\n").split("\t")
        assert c[0] == rec.name
        assert int(c[1]) == rec.flag
        assert int(c[3]) == rec.pos + 1
        assert int(c[4]) == rec.mapq
        cig = rec.cigar_string() or "*"
        assert c[5] == cig, (rec.name, c[5], cig)
        assert int(c[8]) == rec.isize
        assert c[9] == (rec.seq or "*")
        assert c[10] == (rec.qual or "*")
