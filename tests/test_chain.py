"""Device chaining vs the scalar reference implementation."""

import numpy as np
import pytest

from pansvr_tpu.index.query import RefSeed
from pansvr_tpu.ops import chain_ref
from pansvr_tpu.ops.chain import chain_batch


def _random_seeds(rng, n, str_like=False):
    """Seed sets resembling expand_seed output: clusters along a diagonal
    plus noise."""
    seeds = []
    diag = int(rng.integers(1000, 5000))
    read_pos = 0
    for k in range(n):
        if rng.random() < 0.7 and seeds:
            # colinear continuation
            read_b = read_pos + int(rng.integers(0, 60))
        else:
            read_b = int(rng.integers(0, 120))
        length = int(rng.integers(20, 40))
        ref_b = diag + read_b + int(rng.integers(-8, 9))
        if rng.random() < 0.2:
            ref_b = int(rng.integers(1000, 8000))  # off-diagonal noise
        seeds.append(
            RefSeed(
                seed_id=int(rng.integers(0, max(2, n // 2))),
                read_begin=read_b,
                read_end=read_b + length - 1,
                ref_begin=ref_b,
                ref_end=ref_b + length - 1,
                cov=length,
            )
        )
        read_pos = read_b
    return seeds


def _to_batch(seed_lists, S):
    B = len(seed_lists)
    out = {
        k: np.zeros((B, S), np.int32)
        for k in ["rb", "re", "fb", "fe", "cov", "sid"]
    }
    valid = np.zeros((B, S), bool)
    for b, seeds in enumerate(seed_lists):
        for i, s in enumerate(seeds[:S]):
            out["rb"][b, i] = s.read_begin
            out["re"][b, i] = s.read_end
            out["fb"][b, i] = s.ref_begin
            out["fe"][b, i] = s.ref_end
            out["cov"][b, i] = s.cov
            out["sid"][b, i] = s.seed_id
            valid[b, i] = True
    return out, valid


@pytest.mark.parametrize("is_str", [False, True], ids=["normal", "str"])
def test_chain_matches_reference(is_str):
    rng = np.random.default_rng(20)
    S = 64
    seed_lists = [
        _random_seeds(rng, int(rng.integers(1, S))) for _ in range(24)
    ]
    arrs, valid = _to_batch(seed_lists, S)
    res = chain_batch(
        arrs["rb"], arrs["re"], arrs["fb"], arrs["fe"], arrs["cov"],
        arrs["sid"], valid, np.full(len(seed_lists), is_str),
    )
    for b, seeds in enumerate(seed_lists):
        g = chain_ref.chain_seeds(seeds, is_str=is_str)
        n = g.n
        dev_dist = np.asarray(res.dist[b][:n])
        dev_pre = np.asarray(res.pre[b][:n])
        np.testing.assert_array_equal(
            dev_dist, g.dist.astype(np.int64),
            err_msg=f"case {b} dist mismatch",
        )
        np.testing.assert_array_equal(
            dev_pre, g.pre, err_msg=f"case {b} pre mismatch"
        )


def test_chain_empty_and_single():
    arrs, valid = _to_batch([[RefSeed(0, 5, 30, 100, 125, 26)], []], 8)
    res = chain_batch(
        arrs["rb"], arrs["re"], arrs["fb"], arrs["fe"], arrs["cov"],
        arrs["sid"], valid, np.array([False, False]),
    )
    assert int(res.dist[0][0]) == 26  # dist = cov for isolated node
    assert int(res.pre[0][0]) == -1
    assert int(res.n_valid[1]) == 0


def test_extract_chain_walk():
    # two colinear seeds chain together; extraction walks to the head
    seeds = [
        RefSeed(0, 0, 29, 1000, 1029, 30),
        RefSeed(1, 30, 59, 1030, 1059, 30),
    ]
    g = chain_ref.chain_seeds(seeds, is_str=False)
    hit = chain_ref.extract_chain(g)
    assert hit is not None
    assert hit.chain_score == 30 + 30 - max(1 - 1, 0)
    assert hit.read_begin == 0 and hit.ref_begin == 1000
    # second extraction returns nothing (all used)
    assert chain_ref.extract_chain(g) is None
