"""Device seeding + host merge/expand vs the scalar index-query oracle."""

import numpy as np
import pytest

from pansvr_tpu.align.host_align import HostAligner, SEED_STEP
from pansvr_tpu.index import query as Q
from pansvr_tpu.index.builder import build_index
from pansvr_tpu.index.device import to_device
from pansvr_tpu.ops.seeding import merge_expand_batch, pack_reads, seed_reads
from pansvr_tpu.utils import dna
from pansvr_tpu.utils.simulate import random_genome


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(30)
    contigs = list(random_genome(rng, {f"c{i}": 2500 for i in range(4)}).items())
    # plant an exact repeat across two contigs so some unitigs have pos_n > 1
    rep = contigs[0][1][500:900]
    c1 = contigs[1][1]
    contigs[1] = (contigs[1][0], c1[:1000] + rep + c1[1400:])
    idx = build_index(contigs, first_level_bases=10)
    didx = to_device(idx)
    aligner = HostAligner(idx) if False else None
    return idx, didx, contigs


def _host_mems(idx, codes):
    """Oracle seeding identical to HostAligner._seed_read."""
    al = HostAligner.__new__(HostAligner)
    al.idx = idx
    return al._seed_read(codes, None)


def _reads_from(contigs, rng, n, L=150, err=0.01):
    reads = []
    for _ in range(n):
        name, seq = contigs[int(rng.integers(len(contigs)))]
        p = int(rng.integers(0, len(seq) - L))
        codes = dna.encode(seq[p : p + L])
        mask = rng.random(L) < err
        codes[mask] = (codes[mask] + 1) % 4
        reads.append(codes)
    return reads


def test_device_seeding_matches_oracle(world):
    idx, didx, contigs = world
    rng = np.random.default_rng(31)
    reads = _reads_from(contigs, rng, 16)
    L = 150
    B = len(reads)
    codes = np.stack(reads)
    words = pack_reads(codes)
    lens = np.full(B, L, np.int32)
    S0 = (L - idx.search_k) // SEED_STEP + 1
    mask = np.ones((B, S0), bool)

    sb = seed_reads(didx, words, lens, mask, S0=S0)
    assert not np.asarray(sb.n_overflow).any()
    for b in range(B):
        expect = _host_mems(idx, reads[b])
        got = []
        valid = np.asarray(sb.valid[b])
        for m in np.nonzero(valid)[0]:
            got.append(
                (int(sb.uid[b, m]), int(sb.read_pos[b, m]),
                 int(sb.uni_pos_off[b, m]), int(sb.length[b, m]),
                 int(sb.pos_n[b, m]))
            )
        exp = [(m.uid, m.read_pos, m.uni_pos_off, m.length, m.pos_n)
               for m in expect]
        assert sorted(got) == sorted(exp), f"read {b}: {got} != {exp}"


def test_merge_expand_matches_oracle(world):
    idx, didx, contigs = world
    rng = np.random.default_rng(32)
    reads = _reads_from(contigs, rng, 12, err=0.02)
    L = 150
    B = len(reads)
    codes = np.stack(reads)
    words = pack_reads(codes)
    lens = np.full(B, L, np.int32)
    S0 = (L - idx.search_k) // SEED_STEP + 1
    mask = np.ones((B, S0), bool)
    sb = seed_reads(didx, words, lens, mask, S0=S0)
    es = merge_expand_batch(sb, idx, S=128)

    for b in range(B):
        mems = _host_mems(idx, reads[b])
        merged = Q.merge_seeds(mems)
        seeds = Q.expand_seeds(idx, merged)
        exp = sorted(
            (s.read_begin, s.read_end, s.ref_begin, s.ref_end, s.cov)
            for s in seeds
        )
        got = sorted(
            (int(es.read_begin[b, i]), int(es.read_end[b, i]),
             int(es.ref_begin[b, i]), int(es.ref_end[b, i]),
             int(es.cov[b, i]))
            for i in np.nonzero(es.valid[b])[0]
        )
        assert got == exp, f"read {b}"
        assert es.n_dropped[b] == 0


def test_seed_mask_respected(world):
    idx, didx, contigs = world
    rng = np.random.default_rng(33)
    reads = _reads_from(contigs, rng, 2, err=0.0)
    codes = np.stack(reads)
    words = pack_reads(codes)
    L = 150
    S0 = (L - idx.search_k) // SEED_STEP + 1
    lens = np.full(2, L, np.int32)
    mask = np.zeros((2, S0), bool)  # everything masked -> no seeds
    sb = seed_reads(didx, words, lens, mask, S0=S0)
    assert not bool(np.asarray(sb.valid).any())


def test_seed_reads_flat_matches_v1(world):
    """The flat globally-compacted front (seed_reads_flat) must produce
    the exact same SeedBatch as v1, and flag (not corrupt) rows cut by
    the NF cap."""
    from pansvr_tpu.ops.seeding import FLAT_OVERFLOW, seed_reads_flat

    idx, didx, contigs = world
    rng = np.random.default_rng(35)
    reads = _reads_from(contigs, rng, 24, err=0.03)
    L = 150
    B = len(reads)
    codes = np.stack(reads)
    words = pack_reads(codes)
    lens = np.full(B, L, np.int32)
    lens[::5] = 120
    S0 = (L - idx.search_k) // SEED_STEP + 1
    mask = np.ones((B, S0), bool)
    mask[3, ::3] = False

    v1 = seed_reads(didx, words, lens, mask, S0=S0, M=32)
    v5 = seed_reads_flat(didx, words, lens, mask, S0=S0, M=32, nf_mult=32)
    # round-3 gather variants must be bit-identical to the legacy lanes
    v5_legacy = seed_reads_flat(didx, words, lens, mask, S0=S0, M=32,
                                nf_mult=32, ent="split", ext="steps",
                                wb="gather")
    v5_rg = seed_reads_flat(didx, words, lens, mask, S0=S0, M=32,
                            nf_mult=32, wb="rowgather")
    v6 = seed_reads_flat(didx, words, lens, mask, S0=S0, M=32,
                         nf_mult=32, probe="sortjoin")
    for variant, name in ((v5_legacy, "legacy lanes"),
                          (v5_rg, "rowgather writeback"),
                          (v6, "sortjoin probe")):
        for f in ("uid", "read_pos", "uni_pos_off", "length", "pos_n",
                  "valid", "n_overflow"):
            assert np.array_equal(np.asarray(getattr(v5, f)),
                                  np.asarray(getattr(variant, f))), \
                f"{name} differs in {f}"
    assert not (np.asarray(v5.n_overflow) >= FLAT_OVERFLOW).any()
    assert np.array_equal(np.asarray(v1.n_overflow),
                          np.asarray(v5.n_overflow))
    # M-overflow rows are host-fallback in both fronts; v5 gives them no
    # lanes, so field equality is asserted on the non-overflow rows
    ok0 = np.asarray(v1.n_overflow) == 0
    for f in ("uid", "read_pos", "uni_pos_off", "length", "pos_n", "valid"):
        a, b = np.asarray(getattr(v1, f)), np.asarray(getattr(v5, f))
        assert np.array_equal(a[ok0], b[ok0]), f"field {f} differs (v5 flat)"

    # NF pressure: every row either matches v1 exactly or carries the
    # FLAT_OVERFLOW marker (-> host fallback in the engine)
    v5p = seed_reads_flat(didx, words, lens, mask, S0=S0, M=32, nf_mult=4)
    ovp = np.asarray(v5p.n_overflow)
    ok = (ovp < FLAT_OVERFLOW) & (np.asarray(v1.n_overflow) == 0)
    for f in ("uid", "read_pos", "uni_pos_off", "length", "pos_n", "valid"):
        a, b = np.asarray(getattr(v1, f)), np.asarray(getattr(v5p, f))
        assert np.array_equal(a[ok], b[ok]), f"unflagged rows differ in {f}"


def test_merge_expand_device3_matches_v1(world):
    """The gather-restructured device merge/expand (segmented-scan run
    attributes + one compaction sort) must be bit-identical to v1 — on
    real seed batches and on adversarial random ones (mixed validity,
    sampled and aborted pos_n tiers)."""
    from pansvr_tpu.ops.seeding import (
        SeedBatch, merge_expand_device, merge_expand_device3)

    idx, didx, contigs = world
    rng = np.random.default_rng(36)
    reads = _reads_from(contigs, rng, 24, err=0.03)
    L = 150
    codes = np.stack(reads)
    words = pack_reads(codes)
    lens = np.full(len(reads), L, np.int32)
    S0 = (L - idx.search_k) // SEED_STEP + 1
    mask = np.ones((len(reads), S0), bool)
    sb = seed_reads(didx, words, lens, mask, S0=S0, M=32)

    B2, M = 64, 32
    sb_rand = SeedBatch(
        uid=rng.integers(0, 50, (B2, M)).astype(np.int32),
        read_pos=rng.integers(0, 140, (B2, M)).astype(np.int32),
        uni_pos_off=rng.integers(0, 4000, (B2, M)).astype(np.int32),
        length=rng.integers(20, 60, (B2, M)).astype(np.int32),
        pos_n=rng.choice([1, 2, 3, 600, 9000], (B2, M)).astype(np.int32),
        valid=rng.random((B2, M)) < 0.7,
        n_overflow=np.zeros(B2, np.int32),
    )
    for batch in (sb, sb_rand):
        for S in (32, 64):
            e1 = merge_expand_device(batch, didx, S=S)
            for name, me in (("v3", merge_expand_device3),):
                e2 = me(batch, didx, S=S)
                for f in e1._fields:
                    assert np.array_equal(
                        np.asarray(getattr(e1, f)),
                        np.asarray(getattr(e2, f))
                    ), f"{name} S={S} field {f} differs"


