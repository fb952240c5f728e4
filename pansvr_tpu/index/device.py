"""Device-resident (HBM) form of the RdBG index.

Flat int32 arrays uploaded once and shared by all seeding batches. The
unitig and reference sequences are packed 16 bases per uint32 word
(MSB-first) so MEM extension can compare 16 bases per XOR+clz step —
the TPU analog of the reference's 64-bit bit-parallel compare
(deBGA_index.cpp:116-128).

int64 is avoided throughout (TPU int32 lanes; x64 disabled): k-mer keys
are handled as (first-level bucket, low-bits residue) pairs which each
fit 32 bits for k=22 / search_k=20 / first_level >= 12.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from .builder import RdBGIndex


def pack_u32(codes: np.ndarray) -> np.ndarray:
    """2-bit codes -> uint32 words, 16 bases/word, MSB-first (int32 view)."""
    n = len(codes)
    n_words = (n + 15) // 16
    padded = np.zeros(n_words * 16, dtype=np.uint32)
    padded[:n] = codes & 3
    mat = padded.reshape(n_words, 16)
    shifts = np.uint32(2) * (np.uint32(15) - np.arange(16, dtype=np.uint32))
    return (mat << shifts).sum(axis=1, dtype=np.uint32).view(np.int32)


_ARRAY_FIELDS = (
    "hash_g", "kmer_g", "off_g", "uni_seqf", "uni_posp", "uni_pos",
    "uni_words", "ref_words",
)
_STATIC_FIELDS = (
    "k", "search_k", "first_level_bases", "uni_len", "ref_len",
    "n_kmer", "n_uni", "max_bucket_bits",
)


@dataclass(frozen=True)
class DeviceIndex:
    """Pytree: arrays are leaves, scalar metadata is static aux data (so
    jitted consumers can use the ints in shapes/static expressions)."""
    k: int
    search_k: int
    first_level_bases: int
    hash_g: jnp.ndarray     # (4^FL + 1,) int32 bucket starts
    kmer_g: jnp.ndarray     # (n_kmer,) int32 low-bit residues
    off_g: jnp.ndarray      # (n_kmer,) int32 k-mer offsets in unitig space
    uni_seqf: jnp.ndarray   # (n_uni + 1,) int32
    uni_posp: jnp.ndarray   # (n_uni + 1,) int32
    uni_pos: jnp.ndarray    # (n_occ,) int32 0-based occurrence starts
    uni_words: jnp.ndarray  # packed unitig sequence, 16 bases/int32 word
    uni_len: int
    ref_words: jnp.ndarray  # packed reference (N->2), 16 bases/int32 word
    ref_len: int
    n_kmer: int
    n_uni: int
    max_bucket_bits: int = 24   # ceil(log2(largest first-level bucket))


jax.tree_util.register_pytree_node(
    DeviceIndex,
    lambda d: (
        tuple(getattr(d, f) for f in _ARRAY_FIELDS),
        tuple(getattr(d, f) for f in _STATIC_FIELDS),
    ),
    lambda aux, children: DeviceIndex(
        **dict(zip(_ARRAY_FIELDS, children)), **dict(zip(_STATIC_FIELDS, aux))
    ),
)


def to_device(idx: RdBGIndex) -> DeviceIndex:
    packed_ref = np.where(idx.ref_codes >= 4, np.uint8(2), idx.ref_codes)
    packed_uni = np.where(idx.uni_codes >= 4, np.uint8(2), idx.uni_codes)
    bucket_sizes = np.diff(idx.hash_g)
    max_bucket = int(bucket_sizes.max()) if len(bucket_sizes) else 1
    mbb = max(int(np.ceil(np.log2(max(max_bucket, 2)))) + 1, 4)
    return DeviceIndex(
        max_bucket_bits=mbb,
        k=idx.k,
        search_k=idx.search_k,
        first_level_bases=idx.first_level_bases,
        hash_g=jnp.asarray(idx.hash_g.astype(np.int32)),
        kmer_g=jnp.asarray(idx.kmer_g.view(np.int32)),
        off_g=jnp.asarray(idx.off_g.astype(np.int32)),
        uni_seqf=jnp.asarray(idx.uni_seqf.astype(np.int32)),
        uni_posp=jnp.asarray(idx.uni_posp.astype(np.int32)),
        uni_pos=jnp.asarray(idx.uni_pos.astype(np.int32)),
        uni_words=jnp.asarray(pack_u32(packed_uni)),
        uni_len=int(len(idx.uni_codes)),
        ref_words=jnp.asarray(pack_u32(packed_ref)),
        ref_len=int(len(idx.ref_codes)),
        n_kmer=int(idx.n_kmers),
        n_uni=int(idx.n_unitigs),
    )
