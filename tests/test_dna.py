import numpy as np
import pytest

from pansvr_tpu.utils import dna


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = dna.encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert dna.decode(codes) == "ACGTNACGTN"


def test_revcomp():
    assert dna.revcomp("ACGT") == "ACGT"
    assert dna.revcomp("AACG") == "CGTT"
    assert dna.revcomp("ANT") == "ANT"


def test_pack_unpack_2bit():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=1000).astype(np.uint8)
    words = dna.pack_2bit(codes)
    assert len(words) == (1000 + 31) // 32
    for start, ln in [(0, 32), (5, 100), (970, 30), (31, 33)]:
        out = dna.unpack_2bit(words, start, ln)
        np.testing.assert_array_equal(out, codes[start : start + ln])


def test_pack_msb_first():
    # base 0 occupies the two most-significant bits of word 0
    codes = np.zeros(32, dtype=np.uint8)
    codes[0] = 3
    w = dna.pack_2bit(codes)
    assert w[0] == np.uint64(3) << np.uint64(62)


def test_kmer_codes():
    codes = dna.encode("ACGTA")
    k2 = dna.kmer_codes(codes, 2)
    # AC=0b0001=1, CG=0b0110=6, GT=0b1011=11, TA=0b1100=12
    assert list(k2) == [1, 6, 11, 12]
    kn = dna.kmer_codes(dna.encode("ACNTA"), 2)
    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    assert kn[0] != sentinel and kn[1] == sentinel and kn[2] == sentinel


def test_fill_n_deterministic():
    codes = dna.encode("ACGTNNNN")
    a = dna.fill_n(codes, seed=7)
    b = dna.fill_n(codes, seed=7)
    np.testing.assert_array_equal(a, b)
    assert (a < 4).all()
    np.testing.assert_array_equal(a[:4], codes[:4])
