"""On-chip kernel parity gate: the COMPILED (Mosaic) Pallas wavefront
DP + traceback vs the scalar ksw2 oracle, on whatever backend jax
resolves (the real chip outside pytest; the virtual CPU mesh inside).

CI runs the Pallas kernels only in interpret mode
(tests/test_extd2_pallas.py), so a Mosaic regression could ship with
every test green. This module is the hardware gate:

  PANSVR_ONCHIP_TESTS=1 python -m pytest tests/test_onchip.py -q

runs it against the real backend, and bench.py runs the quick variant
during warm-up so every recorded BENCH number self-checks first.
Reference spec for the kernel semantics: src/kswlib/ksw2_extd2_sse.c
(pinned by the fuzz-verified ops/ksw2_ref.py oracle).

With more than one visible device, the sharded DP program
(align.engine._sharded_dp with pallas=True) is also checked against
the single-device kernel — the mesh+pallas combination no other test
executes.
"""

from __future__ import annotations

import numpy as np

from . import ksw2_ref
from .extd2_jax import Extd2Params
from .extd2_pallas import (
    BLK,
    _plan,
    extd2_batch_pallas,
    ops_to_cigar_skip,
    traceback_batch_pallas,
)

ALN = Extd2Params()
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


def _fuzz_pairs(rng, n_cases):
    pairs = []
    for _ in range(n_cases):
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
        if q:
            pairs.append((np.array(q, np.uint8), t))
    return pairs


def check_extd2(pairs, params, Q=176, T=256, W=256,
                interpret=False) -> int:
    """Compiled kernel + traceback vs the oracle; raises AssertionError
    on the first mismatch, returns the number of cases checked."""
    qc, ql, tc, tl = _pad_batch(pairs, Q, T)
    res = extd2_batch_pallas(qc, ql, tc, tl, params=params, W=W,
                             interpret=interpret)
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
        n_diag_pad=n_diag_pad, Tmax=T, interpret=interpret,
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
        cig = (ops_to_cigar_skip(ops[i], int(i_f[i]), int(j_f[i]))
               if i0[i] >= 0 else [])
        assert cig == ref.cigar, f"case {i} cigar {cig} != {ref.cigar}"
    return len(pairs)


def check_sharded_dp(pairs, params, Q=176, T=256, W=256,
                     interpret=False) -> int:
    """_sharded_dp(pallas=True) over all visible devices vs the
    single-device kernel (bit parity). Returns cases checked, 0 when
    only one device is visible. interpret=True exercises the same
    shard_map program on the virtual CPU mesh (Mosaic needs a TPU)."""
    import jax
    from jax.sharding import Mesh

    from ..align.engine import _dp_pallas_body, _sharded_dp

    devs = jax.devices()
    if len(devs) < 2:
        return 0
    n_dev = len(devs)
    # per-shard batches must stay BLK-aligned after the mesh split
    base = _pad_batch(pairs, Q, T)
    B = base[0].shape[0]
    mult = n_dev * BLK
    B_pad = ((B + mult - 1) // mult) * mult
    qc, ql, tc, tl = (np.resize(a, (B_pad,) + a.shape[1:]).copy()
                      if a.ndim > 1 else np.resize(a, B_pad).copy()
                      for a in base)
    mesh = Mesh(np.array(devs), ("data",))
    fn = _sharded_dp(mesh, params, pallas=True, W=W, K=Q + T,
                     interpret=interpret)
    ops_s, packed_s = (np.asarray(x) for x in fn(qc, ql, tc, tl))
    ops_1, packed_1 = (np.asarray(x) for x in _dp_pallas_body(
        qc, ql, tc, tl, params, W, interpret))
    assert np.array_equal(packed_s, packed_1), "sharded DP packed rows"
    assert np.array_equal(ops_s, ops_1), "sharded DP op rows"
    return B_pad


def run_onchip_parity(quick: bool = False, seed: int = 10,
                      interpret: bool = False) -> dict:
    """The whole gate; returns a summary dict for logging."""
    rng = np.random.default_rng(seed)
    n_fuzz = 8 if quick else 48
    out = {}
    for name, params in (("aln", ALN),) + ((("sv", SV),) if not quick
                                           else ()):
        pairs = _fuzz_pairs(rng, n_fuzz)
        out[f"extd2_{name}"] = check_extd2(pairs, params,
                                           interpret=interpret)
    if not quick:
        out["sharded_dp"] = check_sharded_dp(
            _fuzz_pairs(rng, 16), ALN, interpret=interpret)
    return out
