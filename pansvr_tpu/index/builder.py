"""RdBG (de Bruijn unitig) anchor-reference index — vectorized host builder.

Logical re-implementation of the deBGA index (built by
deBGA_release/src/index_build.c, queried through
src/PanSVgenerateVCF/deBGA_index.{hpp,cpp}) as flat NumPy arrays ready for
TPU HBM upload. NOT a file-format port: coordinates are 0-based throughout
(the reference stores 1-based positions on disk and subtracts 1 at
expand_seed, deBGA_index.cpp:235-245 — we skip the round trip).

Vectorization insight: for an index built from reference sequence (not
reads), every unitig of the repeat-aware de Bruijn graph appears as one or
more maximal runs of consecutive genome positions whose k-mers are
chain-linked (unique out-edge of u == unique in-edge of v). So unitig
discovery is run-length bookkeeping over the position array — no graph
walk:

  1. extract all k-mers + positions per contig (k-mers never span contigs);
  2. np.unique -> distinct k-mer ids; OR-accumulate in/out edge masks
     (bit 4 = contig boundary or N, the reference's `charN` edge,
     index_build.c:622/694);
  3. link(i, i+1) iff same contig, both k-mers valid, u's out-mask is
     exactly {next base} and v's in-mask is exactly {u's first base};
  4. maximal linked runs, deduped by first-kmer id, are the unitigs;
     occurrences of a unitig = all positions of its first k-mer.

Index parameters mirror the reference: k = 22 (K_T, panSVR_run.sh:36),
search k = 20 (LEN_KMER, deBGA_index.hpp:17), two-level table with a
``first_level_bases``-base bucket hash (14 in the reference,
KMER_LEN_FIRST_LEVEL, deBGA_index.cpp:7; parameterized here because
4^14 buckets is 2 GB of pointers that small anchor references don't need).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils import dna

K_T = 22            # indexed k-mer length
LEN_KMER = 20       # search k-mer length
SEED_OFFSET = K_T - LEN_KMER


@dataclass
class RdBGIndex:
    """Flat-array RdBG index. All positions 0-based; all ranges half-open."""

    k: int
    search_k: int
    first_level_bases: int

    # reference space: concatenated anchor contigs
    ref_codes: np.ndarray      # uint8 [ref_len] base codes (N kept as 4)
    ref_words: np.ndarray      # uint64 packed 2-bit (N->2 like charToDna5_N2)
    chr_names: list            # contig names (anchor metadata channel)
    chr_starts: np.ndarray     # int64 [n_chr+1] cumulative 0-based starts

    # unitig space: concatenated unitig sequences
    uni_codes: np.ndarray      # uint8 [uni_len]
    uni_words: np.ndarray      # uint64 packed
    uni_seqf: np.ndarray       # int64 [n_uni+1] unitig start offsets in uni space
    uni_pos: np.ndarray        # int64 [n_occ] 0-based unitig occurrence starts in ref space
    uni_posp: np.ndarray       # int64 [n_uni+1] per-unitig slice into uni_pos

    # two-level k-mer search table (entries sorted by full k-mer value)
    hash_g: np.ndarray         # int64 [4^FL+1] bucket start per FL-base prefix
    kmer_g: np.ndarray         # uint32 [n_kmer] low 2*(k-FL) bits of k-mer
    off_g: np.ndarray          # int64 [n_kmer] k-mer offset in unitig space

    @property
    def ref_len(self) -> int:
        return int(self.chr_starts[-1])

    @property
    def n_unitigs(self) -> int:
        return len(self.uni_seqf) - 1

    @property
    def n_kmers(self) -> int:
        return len(self.kmer_g)

    def chr_of_pos(self, pos: int) -> int:
        """Contig id containing 0-based packed position (cf. the reference's
        get_chromosome_ID, deBGA_index.cpp:370-397)."""
        return int(np.searchsorted(self.chr_starts, pos, side="right")) - 1

    def contig_seq_codes(self, cid: int) -> np.ndarray:
        return self.ref_codes[self.chr_starts[cid] : self.chr_starts[cid + 1]]


def build_index(
    contigs: list[tuple[str, str]],
    k: int = K_T,
    search_k: int = LEN_KMER,
    first_level_bases: int = 14,
) -> RdBGIndex:
    """Build the RdBG index from (name, sequence) anchor contigs."""
    names = [n for n, _ in contigs]
    lengths = np.array([len(s) for _, s in contigs], dtype=np.int64)
    chr_starts = np.zeros(len(contigs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=chr_starts[1:])

    ref_codes = (
        np.concatenate([dna.encode(s) for _, s in contigs])
        if contigs else np.empty(0, dtype=np.uint8)
    )
    # packing maps N->2 ('G'), matching charToDna5_N2 (bit_operation.c:30-38)
    packed_codes = np.where(ref_codes >= 4, np.uint8(2), ref_codes)
    ref_words = dna.pack_2bit(packed_codes)

    # --- per-contig k-mer extraction -------------------------------------
    vals_l, pos_l, prev_l, next_l = [], [], [], []
    for cid in range(len(contigs)):
        codes = ref_codes[chr_starts[cid] : chr_starts[cid + 1]]
        L = len(codes)
        if L < k:
            continue
        vals = dna.kmer_codes(codes, k)          # sentinel for N-containing
        n = L - k + 1
        prev = np.empty(n, dtype=np.uint8)
        prev[0] = 4
        prev[1:] = np.minimum(codes[: n - 1], 4)
        nxt = np.empty(n, dtype=np.uint8)
        nxt[-1] = 4
        nxt[:-1] = np.minimum(codes[k:], 4)
        vals_l.append(vals)
        pos_l.append(np.arange(n, dtype=np.int64) + chr_starts[cid])
        prev_l.append(prev)
        next_l.append(nxt)

    if not vals_l:
        return _empty_index(names, chr_starts, ref_codes, ref_words,
                            k, search_k, first_level_bases)

    vals = np.concatenate(vals_l)
    pos = np.concatenate(pos_l)
    prev = np.concatenate(prev_l)
    nxt = np.concatenate(next_l)

    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    valid = vals != sentinel
    # boundary of contigs in the flattened (vals, pos) stream:
    same_contig_next = np.zeros(len(vals), dtype=bool)
    if len(vals) > 1:
        same_contig_next[:-1] = pos[1:] == pos[:-1] + 1

    uniq, inverse = np.unique(vals[valid], return_inverse=True)
    n_uniq = len(uniq)
    kid = np.full(len(vals), -1, dtype=np.int64)
    kid[valid] = inverse

    # --- edge masks (bit 4 = boundary/N edge) ----------------------------
    in_mask = np.zeros(n_uniq, dtype=np.uint8)
    out_mask = np.zeros(n_uniq, dtype=np.uint8)
    np.bitwise_or.at(in_mask, kid[valid], np.uint8(1) << prev[valid])
    np.bitwise_or.at(out_mask, kid[valid], np.uint8(1) << nxt[valid])

    single_bit = np.array([bin(m).count("1") == 1 and m < 16 for m in range(32)])
    out_single = single_bit[out_mask]
    in_single = single_bit[in_mask]
    first_base = (uniq >> np.uint64(2 * (k - 1))).astype(np.uint8)

    # --- link(i, i+1) over genome positions ------------------------------
    linked = np.zeros(len(vals), dtype=bool)
    if len(vals) > 1:
        a = kid[:-1]
        b = kid[1:]
        cand = same_contig_next[:-1] & (a >= 0) & (b >= 0)
        ai = a[cand]
        bi = b[cand]
        ok = (
            out_single[ai]
            & (out_mask[ai] == (np.uint8(1) << nxt[:-1][cand]))
            & in_single[bi]
            & (in_mask[bi] == (np.uint8(1) << first_base[ai]))
        )
        linked_idx = np.nonzero(cand)[0][ok]
        linked[linked_idx] = True

    # --- maximal runs, deduped by first-kmer id --------------------------
    # run start at i iff valid[i] and (i==0 or not linked[i-1])
    run_start = valid.copy()
    run_start[1:] &= ~linked[:-1]
    starts_idx = np.nonzero(run_start)[0]
    # run length: next run start (or end) after each start
    boundaries = np.nonzero(~np.concatenate([linked, [False]]))[0]
    run_end_idx = boundaries[np.searchsorted(boundaries, starts_idx)]
    run_nk = run_end_idx - starts_idx + 1          # kmers in each run

    first_kid = kid[starts_idx]
    # dedupe runs by first-kmer id -> unitigs (keep first occurrence)
    order = np.argsort(first_kid, kind="stable")
    fk_sorted = first_kid[order]
    is_rep = np.ones(len(order), dtype=bool)
    is_rep[1:] = fk_sorted[1:] != fk_sorted[:-1]
    rep_runs = order[is_rep]                       # representative run per unitig
    rep_runs = rep_runs[np.argsort(starts_idx[rep_runs], kind="stable")]
    n_uni = len(rep_runs)

    uni_first_kid = first_kid[rep_runs]
    uni_nk = run_nk[rep_runs]
    uni_len = uni_nk + k - 1
    uni_seqf = np.zeros(n_uni + 1, dtype=np.int64)
    np.cumsum(uni_len, out=uni_seqf[1:])

    # unitig sequences from genome slices
    rep_pos = pos[starts_idx[rep_runs]]
    uni_codes = ref_codes[np.repeat(rep_pos, uni_len) + _ranges(uni_len)]
    uni_words = dna.pack_2bit(np.where(uni_codes >= 4, np.uint8(2), uni_codes))

    # --- kmer -> offset in unitig space ----------------------------------
    # kmers of representative run i at chain offsets 0..uni_nk[i]-1
    off_g = np.empty(n_uniq, dtype=np.int64)
    chain_kmer_rows = np.repeat(starts_idx[rep_runs], uni_nk) + _ranges(uni_nk)
    chain_offsets = uni_seqf[np.repeat(np.arange(n_uni), uni_nk)] + _ranges(uni_nk)
    off_g[kid[chain_kmer_rows]] = chain_offsets

    # --- unitig occurrences = positions of first kmer --------------------
    kmer_occ_order = np.argsort(kid[valid], kind="stable")
    kmer_occ_pos = pos[valid][kmer_occ_order]
    kmer_occ_start = np.searchsorted(kid[valid][kmer_occ_order],
                                     np.arange(n_uniq + 1))
    occ_counts = kmer_occ_start[uni_first_kid + 1] - kmer_occ_start[uni_first_kid]
    uni_posp = np.zeros(n_uni + 1, dtype=np.int64)
    np.cumsum(occ_counts, out=uni_posp[1:])
    take = np.repeat(kmer_occ_start[uni_first_kid], occ_counts) + _ranges(occ_counts)
    uni_pos = kmer_occ_pos[take]

    # --- two-level search table ------------------------------------------
    fl = first_level_bases
    low_bits = np.uint64(2 * (k - fl))
    bucket = (uniq >> low_bits).astype(np.int64)
    kmer_g = (uniq & ((np.uint64(1) << low_bits) - np.uint64(1))).astype(np.uint32)
    hash_g = np.zeros((1 << (2 * fl)) + 1, dtype=np.int64)
    np.add.at(hash_g, bucket + 1, 1)
    np.cumsum(hash_g, out=hash_g)

    return RdBGIndex(
        k=k, search_k=search_k, first_level_bases=fl,
        ref_codes=ref_codes, ref_words=ref_words,
        chr_names=names, chr_starts=chr_starts,
        uni_codes=uni_codes, uni_words=uni_words,
        uni_seqf=uni_seqf, uni_pos=uni_pos, uni_posp=uni_posp,
        hash_g=hash_g, kmer_g=kmer_g, off_g=off_g,
    )


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concatenate([arange(c) for c in counts]) without the loop."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _empty_index(names, chr_starts, ref_codes, ref_words, k, search_k, fl):
    return RdBGIndex(
        k=k, search_k=search_k, first_level_bases=fl,
        ref_codes=ref_codes, ref_words=ref_words,
        chr_names=names, chr_starts=chr_starts,
        uni_codes=np.empty(0, dtype=np.uint8),
        uni_words=np.empty(0, dtype=np.uint64),
        uni_seqf=np.zeros(1, dtype=np.int64),
        uni_pos=np.empty(0, dtype=np.int64),
        uni_posp=np.zeros(1, dtype=np.int64),
        hash_g=np.zeros((1 << (2 * fl)) + 1, dtype=np.int64),
        kmer_g=np.empty(0, dtype=np.uint32),
        off_g=np.empty(0, dtype=np.int64),
    )
