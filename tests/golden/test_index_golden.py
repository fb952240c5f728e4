"""Cross-validate our NumPy RdBG builder against the real `deBGA index`
binary: same anchor FASTA in, logically-equal index out.

The comparable semantic content of the index is the mapping
    22-mer value -> set of 0-based reference positions of its occurrences
(reached as unitig-occurrence-position + in-unitig offset), plus the
packed reference itself and the contig boundary table. Unitig *partition*
is compared as a multiset of (length, n_occurrences) pairs.
"""

import os
import subprocess

import numpy as np
import pytest

from pansvr_tpu.anchor.builder import AnchorConfig, run_anchor_ref
from pansvr_tpu.index.builder import build_index
from pansvr_tpu.index.debga_io import load_debga_index
from pansvr_tpu.io.fasta import Faidx, read_fasta, write_fasta
from pansvr_tpu.io.vcf import VCFWriter, minimal_header
from pansvr_tpu.utils.simulate import make_dataset


pytestmark = pytest.mark.skipif(
    not os.environ.get("PANSVR_GOLDEN_SLOW"),
    reason="slow (~2 min: deBGA writes a 2 GB hash); set PANSVR_GOLDEN_SLOW=1",
)


@pytest.fixture(scope="module")
def both_indexes(tmp_path_factory, debga_bin):
    tmp = tmp_path_factory.mktemp("idxgold")
    ds = make_dataset(seed=11, n_sv=8, n_pairs=0, types=("DEL", "INS", "DUP"))
    genome_fa = str(tmp / "genome.fa")
    vcf = str(tmp / "svs.vcf")
    anchors_fa = str(tmp / "anchors.fa")
    write_fasta(genome_fa, ds.genome.items(), width=60)
    w = VCFWriter(vcf, minimal_header([(c, len(s)) for c, s in ds.genome.items()]))
    for r in ds.vcf_records:
        w.write(r)
    w.close()
    with open(anchors_fa, "w") as fh:
        run_anchor_ref(vcf, Faidx(genome_fa), fh, AnchorConfig())

    idx_dir = str(tmp / "idx") + "/"
    os.makedirs(idx_dir, exist_ok=True)
    subprocess.run(
        [debga_bin, "index", "-k", "22", anchors_fa, idx_dir],
        check=True, capture_output=True,
    )
    theirs = load_debga_index(idx_dir)
    ours = build_index(list(read_fasta(anchors_fa).items()), first_level_bases=14)
    return ours, theirs


def _kmer_pos_map(idx, sample_entries):
    """entry id -> frozenset of 0-based ref positions of that 22-mer."""
    out = {}
    for e in sample_entries:
        off = int(idx.off_g[e])
        uid = int(np.searchsorted(idx.uni_seqf, off, side="right")) - 1
        in_off = off - int(idx.uni_seqf[uid])
        occ = idx.uni_pos[idx.uni_posp[uid] : idx.uni_posp[uid + 1]]
        out[e] = frozenset(int(p) + in_off for p in occ)
    return out


def test_ref_seq_identical(both_indexes):
    ours, theirs = both_indexes
    n_words = (ours.ref_len + 31) // 32
    np.testing.assert_array_equal(ours.ref_words[:n_words], theirs.ref_words[:n_words])
    assert ours.chr_names == theirs.chr_names
    np.testing.assert_array_equal(ours.chr_starts, theirs.chr_starts)


def test_kmer_table_identical(both_indexes):
    ours, theirs = both_indexes
    assert ours.n_kmers == theirs.n_kmers
    np.testing.assert_array_equal(ours.hash_g, theirs.hash_g)
    np.testing.assert_array_equal(
        ours.kmer_g & np.uint32(0xFFFF), theirs.kmer_g & np.uint32(0xFFFF)
    )


def test_unitig_partition_equal(both_indexes):
    ours, theirs = both_indexes
    def partition(idx):
        lens = np.diff(idx.uni_seqf)
        occs = np.diff(idx.uni_posp)
        return sorted(zip(lens.tolist(), occs.tolist()))
    assert partition(ours) == partition(theirs)


def test_kmer_positions_equal(both_indexes):
    ours, theirs = both_indexes
    rng = np.random.default_rng(0)
    sample = rng.integers(0, ours.n_kmers, size=min(500, ours.n_kmers))
    ours_map = _kmer_pos_map(ours, sample)
    theirs_map = _kmer_pos_map(theirs, sample)
    assert ours_map == theirs_map
