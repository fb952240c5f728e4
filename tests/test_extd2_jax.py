"""Device (JAX) extd2 vs the NumPy reference implementation."""

import numpy as np
import pytest

from pansvr_tpu.ops import ksw2_ref
from pansvr_tpu.ops.extd2_jax import Extd2Params, extd2_batch, traceback

ALN = Extd2Params()  # panSVR realignment profile
SV = Extd2Params(match=2, mismatch=-10, q=24, e=2, q2=32, e2=1, w=132, zdrop=132)


def _pad_batch(pairs, Q, T):
    B = len(pairs)
    qc = np.zeros((B, Q), np.int32)
    tc = np.zeros((B, T), np.int32)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        qc[i, : len(q)] = q
        tc[i, : len(t)] = t
        ql[i] = len(q)
        tl[i] = len(t)
    return qc, ql, tc, tl


def _run_and_compare(pairs, params, Q=160, T=192):
    qc, ql, tc, tl = _pad_batch(pairs, Q, T)
    res = extd2_batch(qc, ql, tc, tl, params=params)
    for i, (q, t) in enumerate(pairs):
        ref = ksw2_ref.extd2(
            q, t, match=params.match, mismatch=params.mismatch,
            q=params.q, e=params.e, q2=params.q2, e2=params.e2,
            w=params.w, zdrop=params.zdrop,
        )
        assert bool(res.zdropped[i]) == ref.zdropped, f"case {i} zdropped"
        assert int(res.max[i]) == ref.max, f"case {i} max"
        if not ref.zdropped:
            assert int(res.score[i]) == ref.score, f"case {i} score"
        assert int(res.mqe[i]) == ref.mqe, f"case {i} mqe"
        assert (int(res.max_q[i]), int(res.max_t[i])) == (ref.max_q, ref.max_t)
        # traceback from the same endpoint the reference uses
        if not ref.zdropped:
            cig = traceback(res.dmat[i], res.st_arr[i], res.en_arr[i],
                            len(t) - 1, len(q) - 1)
        elif ref.max_t >= 0 and ref.max_q >= 0:
            cig = traceback(res.dmat[i], res.st_arr[i], res.en_arr[i],
                            ref.max_t, ref.max_q)
        else:
            cig = []
        assert cig == ref.cigar, f"case {i} cigar {cig} != {ref.cigar}"


@pytest.mark.parametrize("params", [ALN, SV], ids=["aln", "sv"])
def test_batch_mixed_cases(params):
    rng = np.random.default_rng(10)
    pairs = []
    # identical
    s = rng.integers(0, 4, 120).astype(np.uint8)
    pairs.append((s, s.copy()))
    # substitutions
    t = rng.integers(0, 4, 150).astype(np.uint8)
    q = t.copy()
    q[[10, 50, 90]] = (q[[10, 50, 90]] + 1) % 4
    pairs.append((q, t))
    # deletion
    t = rng.integers(0, 4, 180).astype(np.uint8)
    pairs.append((np.concatenate([t[:60], t[100:]]), t))
    # insertion
    t2 = rng.integers(0, 4, 120).astype(np.uint8)
    ins = rng.integers(0, 4, 25).astype(np.uint8)
    pairs.append((np.concatenate([t2[:40], ins, t2[40:]]), t2))
    # unrelated (zdrop territory)
    pairs.append((
        rng.integers(0, 4, 100).astype(np.uint8),
        rng.integers(0, 4, 150).astype(np.uint8),
    ))
    # tiny
    pairs.append((np.array([1], np.uint8), np.array([1, 2, 3], np.uint8)))
    # asymmetric
    pairs.append((rng.integers(0, 4, 10).astype(np.uint8),
                  rng.integers(0, 4, 180).astype(np.uint8)))
    pairs.append((rng.integers(0, 4, 155).astype(np.uint8),
                  rng.integers(0, 4, 12).astype(np.uint8)))
    _run_and_compare(pairs, params)


def test_fuzz_vs_numpy_ref():
    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(24):
        n = int(rng.integers(20, 150))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = list(t)
        for _ in range(int(rng.integers(0, 6))):
            i = int(rng.integers(0, len(q)))
            q[i] = (q[i] + int(rng.integers(1, 4))) % 4
        for _ in range(int(rng.integers(0, 3))):
            g = int(rng.integers(-20, 21))
            i = int(rng.integers(1, max(2, len(q) - abs(g) - 1)))
            if g > 0:
                q[i:i] = [int(rng.integers(0, 4)) for _ in range(g)]
            elif g < 0:
                del q[i : i - g]
        if not q:
            continue
        pairs.append((np.array(q, np.uint8), t))
    _run_and_compare(pairs, ALN)
