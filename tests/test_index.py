import numpy as np
import pytest

from pansvr_tpu.index.builder import build_index, _ranges
from pansvr_tpu.index import query as Q
from pansvr_tpu.utils import dna
from pansvr_tpu.utils.simulate import random_genome


def _mk_contigs(seed=0, n=3, length=3000):
    rng = np.random.default_rng(seed)
    g = random_genome(rng, {f"ctg{i}": length for i in range(n)})
    return list(g.items())


def test_ranges_helper():
    np.testing.assert_array_equal(
        _ranges(np.array([3, 0, 2, 1])), [0, 1, 2, 0, 1, 0]
    )
    assert len(_ranges(np.array([0, 0]))) == 0


def test_index_invariants():
    contigs = _mk_contigs(seed=1)
    idx = build_index(contigs, first_level_bases=8)
    # every unitig sequence matches the reference at each recorded occurrence
    for uid in range(idx.n_unitigs):
        s, e = int(idx.uni_seqf[uid]), int(idx.uni_seqf[uid + 1])
        useq = idx.uni_codes[s:e]
        occs = idx.uni_pos[idx.uni_posp[uid] : idx.uni_posp[uid + 1]]
        assert len(occs) >= 1
        for o in occs:
            np.testing.assert_array_equal(idx.ref_codes[o : o + (e - s)], useq)
    # k-mer table entries sorted within buckets and offsets valid
    assert (idx.off_g >= 0).all() and (idx.off_g + idx.k <= idx.uni_seqf[-1]).all()
    # the k-mer at each off_g matches its table entry's low bits
    shift = np.uint64(2 * (idx.k - idx.first_level_bases))
    for e in [0, idx.n_kmers // 2, idx.n_kmers - 1]:
        off = int(idx.off_g[e])
        val = Q.kmer_value(idx.uni_codes, off, idx.k)
        assert (val & ((1 << int(shift)) - 1)) == int(idx.kmer_g[e])


def test_every_genome_kmer_findable():
    contigs = _mk_contigs(seed=2, n=2, length=2000)
    idx = build_index(contigs, first_level_bases=8)
    sk = idx.search_k
    for name, seq in contigs:
        codes = dna.encode(seq)
        cid = idx.chr_names.index(name)
        base = int(idx.chr_starts[cid])
        for off in range(0, len(codes) - idx.k + 1, 97):
            kmer20 = Q.kmer_value(codes, off, sk)
            rng_res = Q.search_kmer(idx, kmer20)
            assert rng_res is not None, f"20-mer at {name}:{off} not found"
            lo, hi = rng_res
            # one of the entries must expand to a seed on the true diagonal
            # (read here IS the contig, so diagonal == contig base offset)
            found = False
            for entry in range(lo, hi):
                mem = Q.mem_extend(idx, entry, codes, off)
                for s in Q.expand_seeds(idx, Q.merge_seeds([mem])):
                    if s.ref_begin - s.read_begin == base:
                        found = True
            assert found, f"no seed covers {name}:{off}"


def test_mem_extension_maximal():
    # single contig, query a read copied from it with one mismatch planted
    contigs = _mk_contigs(seed=3, n=1, length=1500)
    idx = build_index(contigs, first_level_bases=8)
    seq = contigs[0][1]
    read = dna.encode(seq[500:650])
    read[75] = (read[75] + 1) & 3  # mismatch at read offset 75
    off = 20  # 20-mer inside the left exact segment
    kmer20 = Q.kmer_value(read, off, idx.search_k)
    lo, hi = Q.search_kmer(idx, kmer20)
    mems = [Q.mem_extend(idx, e, read, off) for e in range(lo, hi)]
    # best MEM should span [0, 75) of the read (stops at the mismatch)
    best = max(mems, key=lambda m: m.length)
    assert best.read_pos == 0
    assert best.length == 75


def test_merge_seeds_colinear():
    m1 = Q.MEM(uid=5, read_pos=0, uni_pos_off=100, length=30, pos_n=2)
    m2 = Q.MEM(uid=5, read_pos=31, uni_pos_off=131, length=25, pos_n=2)
    merged = Q.merge_seeds([m1, m2])
    assert len(merged) == 1
    assert merged[0].length1 == 31 + 25 - 0
    assert merged[0].cov == 30 + 25
    # indel drift breaks the merge
    m3 = Q.MEM(uid=5, read_pos=31, uni_pos_off=135, length=25, pos_n=2)
    assert len(Q.merge_seeds([m1, m3])) == 2
    # different unitig breaks the merge
    m4 = Q.MEM(uid=6, read_pos=31, uni_pos_off=131, length=25, pos_n=2)
    assert len(Q.merge_seeds([m1, m4])) == 2


def test_repeat_positions():
    # a contig with an exact internal repeat: unitig occurrences > 1
    rng = np.random.default_rng(4)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, size=400))
    filler1 = "".join("ACGT"[i] for i in rng.integers(0, 4, size=300))
    filler2 = "".join("ACGT"[i] for i in rng.integers(0, 4, size=300))
    seq = filler1 + unit + filler2 + unit + filler1[::-1]
    idx = build_index([("rep", seq)], first_level_bases=8)
    # a 20-mer from the middle of the repeat must expand to 2 positions
    codes = dna.encode(seq)
    off = 300 + 200  # inside first repeat copy
    kmer20 = Q.kmer_value(codes, off, idx.search_k)
    lo, hi = Q.search_kmer(idx, kmer20)
    seeds = []
    for e in range(lo, hi):
        mem = Q.mem_extend(idx, e, codes, off)
        seeds += Q.expand_seeds(idx, Q.merge_seeds([mem]))
    starts = sorted(set(s.ref_begin - (off - s.read_begin) for s in seeds))
    assert len(starts) == 2


def test_absent_kmer():
    idx = build_index([("c", "ACGT" * 200)], first_level_bases=8)
    # poly-A 20-mer should not exist in an ACGT-repeat contig
    assert Q.search_kmer(idx, 0) is None


def test_spill_matches_ram_path():
    """The external-memory spill grouping and the in-RAM grouping build
    bit-identical indexes (incl. the two-level table now built inside
    grouping)."""
    import numpy as np

    from pansvr_tpu.utils.simulate import make_dataset, DictGenome
    from pansvr_tpu.anchor.builder import AnchorConfig, build_anchor_contigs

    ds = make_dataset(seed=11, n_sv=16, n_pairs=0, types=("DEL", "INS", "DUP"),
                      chrom_lengths={"chr1": 400_000})
    contigs = [(c.name, c.seq) for c in build_anchor_contigs(
        ds.vcf_records, DictGenome(ds.genome), AnchorConfig())]
    a = build_index(contigs, first_level_bases=10)
    b = build_index(contigs, first_level_bases=10, spill_threshold=1)
    for f in ("uni_codes", "uni_seqf", "uni_pos", "uni_posp",
              "hash_g", "kmer_g", "off_g"):
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f)
