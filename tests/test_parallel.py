"""Multi-device sharding on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from pansvr_tpu.align.host_align import SEED_STEP
from pansvr_tpu.index.builder import build_index
from pansvr_tpu.index.device import to_device
from pansvr_tpu.ops.seeding import merge_expand_device, pack_reads, seed_reads
from pansvr_tpu.parallel.mesh import (
    make_data_mesh,
    merge_vcf_parts,
    shard_sv_regions,
    sharded_realign_front,
)
from pansvr_tpu.utils import dna
from pansvr_tpu.utils.simulate import random_genome


def test_sharded_front_matches_single_device(tmp_path):
    import jax

    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    rng = np.random.default_rng(80)
    contigs = list(random_genome(rng, {f"c{i}": 2000 for i in range(3)}).items())
    idx = build_index(contigs, first_level_bases=9)
    didx = to_device(idx)

    B, L = 32, 96
    codes = np.zeros((B, L), np.uint8)
    for b in range(B):
        _, seq = contigs[b % 3]
        p = int(rng.integers(0, len(seq) - L))
        codes[b] = dna.encode(seq[p : p + L])
    words = pack_reads(codes)
    lens = np.full(B, L, np.int32)
    S0 = (L - 20) // SEED_STEP + 1
    mask = np.ones((B, S0), bool)

    mesh = make_data_mesh(8)
    fn = sharded_realign_front(mesh, didx, S0=S0, S=64)
    es_sh, stats_sh, total = fn(words, lens, mask)

    sb = seed_reads(didx, words, lens, mask, S0=S0)
    es = merge_expand_device(sb, didx, S=64)

    np.testing.assert_array_equal(np.asarray(es_sh.valid), np.asarray(es.valid))
    np.testing.assert_array_equal(
        np.asarray(es_sh.ref_begin), np.asarray(es.ref_begin)
    )
    assert int(total) == int(np.asarray(es.valid).sum())


def test_region_sharding_covers_all():
    seen = []
    for s in range(5):
        seen.extend(shard_sv_regions(23, 5, s))
    assert sorted(seen) == list(range(23))


def test_merge_vcf_parts(tmp_path):
    p1 = tmp_path / "a.vcf"
    p2 = tmp_path / "b.vcf"
    p1.write_text("##h\n#CHROM\nchr1\t1\n")
    p2.write_text("##h\n#CHROM\nchr1\t2\n")
    out = tmp_path / "merged.vcf"
    merge_vcf_parts([str(p1), str(p2)], str(out))
    lines = out.read_text().splitlines()
    assert lines.count("#CHROM") == 1
    assert "chr1\t1" in lines and "chr1\t2" in lines
