"""Pallas wavefront extd2 vs the scalar NumPy oracle (interpret mode).

Runs the TPU kernels in Pallas interpreter mode on the CPU backend; the
compiled path shares the exact same trace, so scores/CIGAR parity here
carries over to hardware."""

import numpy as np
import pytest

from pansvr_tpu.ops import ksw2_ref
from pansvr_tpu.ops.extd2_jax import Extd2Params
from pansvr_tpu.ops.extd2_pallas import (
    BLK,
    _plan,
    extd2_batch_pallas,
    ops_to_cigar_skip,
    traceback_batch_pallas,
)

ALN = Extd2Params()  # panSVR realignment profile (w=200)
SV = Extd2Params(match=2, mismatch=-10, q=24, e=2, q2=32, e2=1,
                 w=132, zdrop=132)


def _pad_batch(pairs, Q, T):
    B = ((len(pairs) + BLK - 1) // BLK) * BLK
    qc = np.zeros((B, Q), np.int32)
    tc = np.zeros((B, T), np.int32)
    ql = np.ones(B, np.int32)
    tl = np.ones(B, np.int32)
    for i, (q, t) in enumerate(pairs):
        qc[i, : len(q)] = q
        tc[i, : len(t)] = t
        ql[i] = len(q)
        tl[i] = len(t)
    return qc, ql, tc, tl


def _run_and_compare(pairs, params, Q=176, T=256, W=256):
    from pansvr_tpu.ops.extd2_pallas import state_fits_int8

    qc, ql, tc, tl = _pad_batch(pairs, Q, T)
    # exercise the int8-state recurrence whenever the profile is
    # int8-bounded (compiled TPU path currently runs int32 — the image's
    # Mosaic cannot lower narrow-lane arithmetic — but the int8 math
    # must stay parity-correct for when it can)
    res = extd2_batch_pallas(qc, ql, tc, tl, params=params, W=W,
                             interpret=True,
                             state8=state_fits_int8(params))
    _, n_diag_pad, _, _ = _plan(Q, T, W)

    i0 = np.full(len(ql), -1, np.int32)
    j0 = np.full(len(ql), -1, np.int32)
    refs = []
    for i, (q, t) in enumerate(pairs):
        ref = ksw2_ref.extd2(
            q, t, match=params.match, mismatch=params.mismatch,
            q=params.q, e=params.e, q2=params.q2, e2=params.e2,
            w=params.w, zdrop=params.zdrop,
        )
        refs.append(ref)
        if not ref.zdropped:
            i0[i], j0[i] = len(t) - 1, len(q) - 1
        elif ref.max_t >= 0 and ref.max_q >= 0:
            i0[i], j0[i] = ref.max_t, ref.max_q

    ops, i_f, j_f = traceback_batch_pallas(
        res.dmat, ql, tl, i0, j0, params=params, W=W,
        n_diag_pad=n_diag_pad, Tmax=T, interpret=True,
    )
    ops = np.asarray(ops)
    i_f = np.asarray(i_f)
    j_f = np.asarray(j_f)

    for i, ref in enumerate(refs):
        assert bool(res.zdropped[i]) == ref.zdropped, f"case {i} zdropped"
        assert int(res.max[i]) == ref.max, f"case {i} max"
        if not ref.zdropped:
            assert int(res.score[i]) == ref.score, f"case {i} score"
        assert int(res.mqe[i]) == ref.mqe, f"case {i} mqe"
        assert (int(res.max_q[i]), int(res.max_t[i])) == \
            (ref.max_q, ref.max_t), f"case {i} max endpoint"
        if i0[i] >= 0:
            cig = ops_to_cigar_skip(ops[i], int(i_f[i]), int(j_f[i]))
        else:
            cig = []
        assert cig == ref.cigar, f"case {i} cigar {cig} != {ref.cigar}"


def _mixed_pairs(rng):
    pairs = []
    s = rng.integers(0, 4, 120).astype(np.uint8)
    pairs.append((s, s.copy()))
    t = rng.integers(0, 4, 150).astype(np.uint8)
    q = t.copy()
    q[[10, 50, 90]] = (q[[10, 50, 90]] + 1) % 4
    pairs.append((q, t))
    t = rng.integers(0, 4, 180).astype(np.uint8)
    pairs.append((np.concatenate([t[:60], t[100:]]), t))
    t2 = rng.integers(0, 4, 120).astype(np.uint8)
    ins = rng.integers(0, 4, 25).astype(np.uint8)
    pairs.append((np.concatenate([t2[:40], ins, t2[40:]]), t2))
    pairs.append((
        rng.integers(0, 4, 100).astype(np.uint8),
        rng.integers(0, 4, 150).astype(np.uint8),
    ))
    pairs.append((np.array([1], np.uint8), np.array([1, 2, 3], np.uint8)))
    pairs.append((rng.integers(0, 4, 10).astype(np.uint8),
                  rng.integers(0, 4, 180).astype(np.uint8)))
    pairs.append((rng.integers(0, 4, 155).astype(np.uint8),
                  rng.integers(0, 4, 12).astype(np.uint8)))
    return pairs


@pytest.mark.parametrize("params", [ALN, SV], ids=["aln", "sv"])
def test_pallas_mixed_cases(params):
    rng = np.random.default_rng(10)
    _run_and_compare(_mixed_pairs(rng), params)


def test_pallas_fuzz():
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


def test_pallas_long_targets_sliding_window():
    """Targets longer than W exercise the sliding global window (the
    band-relative storage path the lax.scan version never had)."""
    rng = np.random.default_rng(12)
    params = SV  # fc_sv contig profile, w=132 << T
    pairs = []
    for _ in range(8):
        n = int(rng.integers(500, 900))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = list(t)
        for _ in range(int(rng.integers(0, 10))):
            i = int(rng.integers(0, len(q)))
            q[i] = (q[i] + int(rng.integers(1, 4))) % 4
        for _ in range(int(rng.integers(0, 3))):
            g = int(rng.integers(-40, 41))
            i = int(rng.integers(1, max(2, len(q) - abs(g) - 1)))
            if g > 0:
                q[i:i] = [int(rng.integers(0, 4)) for _ in range(g)]
            elif g < 0:
                del q[i : i - g]
        pairs.append((np.array(q, np.uint8), t))
    _run_and_compare(pairs, params, Q=960, T=912, W=192)


def test_pallas_small_class_96_128():
    """The engine's small DP size class (96, 128, W=128): every fuzz
    problem that fits it must match the scalar oracle exactly (same
    criterion the (176, 256, W=256) class is held to)."""
    rng = np.random.default_rng(13)
    pairs = []
    for _ in range(24):
        n = int(rng.integers(8, 128))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = list(t[: min(n, 96)])
        for _ in range(int(rng.integers(0, 5))):
            i = int(rng.integers(0, len(q)))
            q[i] = (q[i] + int(rng.integers(1, 4))) % 4
        for _ in range(int(rng.integers(0, 3))):
            g = int(rng.integers(-15, 16))
            i = int(rng.integers(1, max(2, len(q) - abs(g) - 1)))
            if g > 0:
                q[i:i] = [int(rng.integers(0, 4)) for _ in range(g)]
            elif g < 0:
                del q[i : i - g]
        q = q[:96]
        if not q:
            continue
        pairs.append((np.array(q, np.uint8), t))
    _run_and_compare(pairs, ALN, Q=96, T=128, W=128)


def test_pallas_tiny_class_48_64():
    """The engine's tiny DP size class (48, 64, W=64) — chain-gap
    repair segments are mostly this small (median 14x29 on the bench
    world); same oracle-exact criterion as the other classes."""
    rng = np.random.default_rng(17)
    pairs = []
    for _ in range(24):
        n = int(rng.integers(4, 64))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = list(t[: min(n, 48)])
        for _ in range(int(rng.integers(0, 4))):
            i = int(rng.integers(0, len(q)))
            q[i] = (q[i] + int(rng.integers(1, 4))) % 4
        for _ in range(int(rng.integers(0, 2))):
            g = int(rng.integers(-8, 9))
            i = int(rng.integers(1, max(2, len(q) - abs(g) - 1)))
            if g > 0:
                q[i:i] = [int(rng.integers(0, 4)) for _ in range(g)]
            else:
                del q[i : i - g]
        q = np.array(q[:48], np.uint8)
        if len(q) < 2:
            q = np.array([0, 1], np.uint8)
        pairs.append((q, t))
    _run_and_compare(pairs, Extd2Params(), Q=48, T=64, W=64)
