"""CRAM reader/writer roundtrip + fc_signal CRAM==BAM contract."""

import io

import pytest

from pansvr_tpu.io.alignment import open_alignment
from pansvr_tpu.io.bam import BamReader
from pansvr_tpu.io.cram import CramReader, CramWriter, itf8_put, ltf8_put, ByteReader
from pansvr_tpu.utils.simulate import make_dataset, write_sim_bam


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cram")
    ds = make_dataset(seed=55, n_sv=3, n_pairs=400, types=("DEL", "INS"),
                      chrom_lengths={"chr1": 80_000, "chr2": 60_000})
    bam = str(tmp / "sim.bam")
    write_sim_bam(ds, bam)
    return ds, bam, tmp


def test_itf8_ltf8_roundtrip():
    for v in (0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
              268435455, 268435456, 2**31 - 1, -1):
        br = ByteReader(itf8_put(v))
        got = br.itf8()
        want = v if v >= 0 else v  # -1 encodes as 0xFFFFFFFF -> -1
        assert got == want, (v, got)
    for v in (0, 127, 128, 2**20, 2**35, 2**50, 2**62):
        br = ByteReader(ltf8_put(v))
        assert br.ltf8() == v, v


def test_cram_roundtrip_records(world):
    ds, bam, tmp = world
    cram = str(tmp / "sim.cram")
    with BamReader(bam) as rd:
        header = rd.header
        recs = list(rd)
    w = CramWriter(cram, header, ref=ds.genome)
    for r in recs:
        w.write(r)
    w.close()

    with CramReader(cram, ref=ds.genome) as cr:
        assert cr.header.ref_names == header.ref_names
        got = list(cr)
    assert len(got) == len(recs)
    for a, b in zip(recs, got):
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.tid == b.tid
        assert a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar, (a.name, a.cigar, b.cigar)
        assert a.mtid == b.mtid
        assert a.mpos == b.mpos
        assert a.isize == b.isize
        assert a.seq == b.seq, a.name
        assert a.qual == b.qual
        assert a.tags == b.tags


def test_cram_open_alignment_dispatch(world):
    ds, bam, tmp = world
    cram = str(tmp / "sim.cram")      # written by previous test
    rd = open_alignment(bam)
    assert isinstance(rd, BamReader)
    rd.close()
    rd = open_alignment(cram, ref=ds.genome)
    assert isinstance(rd, CramReader)
    rd.close()


def test_fc_signal_cram_matches_bam(world):
    """The VERDICT done-criterion: fc_signal over a CRAM of the sim
    world yields a byte-identical signal FASTQ to the BAM path."""
    from pansvr_tpu.signal.extract import SignalOptions, extract_signal

    ds, bam, tmp = world
    cram = str(tmp / "sim.cram")
    opts = SignalOptions(discard_both_full_match=False,
                         not_using_filter=True)
    out_bam = io.StringIO()
    extract_signal(bam, out_bam, opts=opts)
    out_cram = io.StringIO()
    extract_signal(cram, out_cram, opts=opts, ref=ds.genome)
    assert out_bam.getvalue() == out_cram.getvalue()
    assert out_bam.getvalue()  # non-trivial


def test_cram_unmapped_and_tags(world, tmp_path):
    """Unmapped records, soft clips, and assorted tag types survive."""
    from pansvr_tpu.io.bam import BamHeader, BamRecord

    ds, _, _ = world
    header = BamHeader.from_sam_text(
        "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:80000\n")
    genome = {"chr1": ds.genome["chr1"]}
    seq40 = ds.genome["chr1"][100:140]
    recs = [
        BamRecord(name="u1", flag=0x4 | 0x1, tid=-1, pos=-1, mapq=0,
                  cigar=[], mtid=-1, mpos=-1, isize=0,
                  seq="ACGTACGTAA", qual="IIIIIIIIII",
                  tags=[("XX", "i", -7), ("YY", "Z", "hello"),
                        ("ZZ", "f", 1.5), ("AA", "A", "c")]),
        BamRecord(name="m1", flag=0x10, tid=0, pos=100, mapq=37,
                  cigar=[("S", 5), ("M", 30), ("I", 2), ("M", 3)],
                  mtid=-1, mpos=-1, isize=0,
                  seq="GGGGG" + seq40[5:35] + "TT" + seq40[35:38],
                  qual="J" * 40, tags=[]),
        BamRecord(name="d1", flag=0, tid=0, pos=200, mapq=60,
                  cigar=[("M", 10), ("D", 4), ("M", 10)],
                  mtid=-1, mpos=-1, isize=0,
                  seq=ds.genome["chr1"][200:210] + ds.genome["chr1"][214:224],
                  qual="",  # absent quals
                  tags=[("NM", "i", 4)]),
    ]
    cram = str(tmp_path / "mix.cram")
    w = CramWriter(cram, header, ref=genome)
    for r in recs:
        w.write(r)
    w.close()
    with CramReader(cram, ref=genome) as cr:
        got = list(cr)
    assert len(got) == 3
    for a, b in zip(recs, got):
        for f in ("name", "tid", "pos", "mapq", "cigar", "mtid",
                  "mpos", "isize", "seq", "qual", "tags"):
            assert getattr(a, f) == getattr(b, f), (a.name, f)
    # flags: u1 was paired so FPAIRED survives; others exact
    assert got[0].flag == recs[0].flag
    assert got[1].flag == recs[1].flag
    assert got[2].flag == recs[2].flag
