"""Tolerance-aware SV comparator (io/vcf_compare.py)."""

from pansvr_tpu.io.vcf import VCFRecord
from pansvr_tpu.io.vcf_compare import (
    SVCall,
    call_from_record,
    compare_calls,
)


def _c(chrom, pos, svt, svlen):
    return SVCall(chrom=chrom, pos1=pos, sv_type=svt, svlen=svlen,
                  end=pos + (abs(svlen) if svt != "INS" else 0))


def test_exact_and_classes():
    truth = [_c("chr1", 100, "DEL", -50), _c("chr1", 500, "INS", 30),
             _c("chr2", 900, "DEL", -200)]
    query = [_c("chr1", 100, "DEL", -50),      # EXACT
             _c("chr1", 503, "INS", 30),       # POS_SHIFT
             _c("chr2", 900, "DEL", -180),     # LEN_DIFF
             _c("chr2", 5000, "INS", 40)]      # EXTRA
    res = compare_calls(truth, query, pos_tol=20, min_size_sim=0.7)
    assert len(res.matches) == 3 and not res.missed
    assert [m.cls for m in sorted(res.matches,
                                  key=lambda m: m.truth.pos1)] == \
        ["EXACT", "POS_SHIFT", "LEN_DIFF"]
    assert [c.pos1 for c in res.extra] == [5000]
    assert res.recall == 1.0 and abs(res.precision - 0.75) < 1e-9


def test_one_to_one_greedy():
    # two truth DELs near one query: only the closer one matches
    truth = [_c("chr1", 100, "DEL", -50), _c("chr1", 140, "DEL", -50)]
    query = [_c("chr1", 102, "DEL", -50)]
    res = compare_calls(truth, query, pos_tol=500, min_size_sim=0.7)
    assert len(res.matches) == 1
    assert res.matches[0].truth.pos1 == 100
    assert [c.pos1 for c in res.missed] == [140]


def test_tolerance_cuts():
    truth = [_c("chr1", 100, "DEL", -50)]
    # outside pos_tol
    res = compare_calls(truth, [_c("chr1", 700, "DEL", -50)], pos_tol=500)
    assert res.missed and res.extra
    # size ratio below threshold (20/50 = 0.4)
    res = compare_calls(truth, [_c("chr1", 100, "DEL", -20)],
                        min_size_sim=0.7)
    assert res.missed and res.extra
    # type mismatch
    res = compare_calls(truth, [_c("chr1", 100, "INS", 50)])
    assert res.missed and res.extra


def test_call_from_record_derivations():
    # INFO-driven
    r = VCFRecord(chrom="chr1", pos1=10, id="x", ref="N", alts=["<DEL>"],
                  qual=".", filter="PASS",
                  info={"SVTYPE": "DEL", "SVLEN": "-120", "END": "130"})
    c = call_from_record(r)
    assert (c.sv_type, c.svlen, c.end) == ("DEL", -120, 130)
    # allele-length-driven (fc_anchor_ref-style records)
    r = VCFRecord(chrom="chr1", pos1=10, id="x", ref="A" * 61, alts=["A"],
                  qual=".", filter=".", info={})
    c = call_from_record(r)
    assert (c.sv_type, c.svlen) == ("DEL", -60)
    r = VCFRecord(chrom="chr1", pos1=10, id="x", ref="A", alts=["A" * 31],
                  qual=".", filter=".", info={})
    c = call_from_record(r)
    assert (c.sv_type, c.svlen) == ("INS", 30)
