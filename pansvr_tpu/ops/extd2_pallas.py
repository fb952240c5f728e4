"""Pallas TPU wavefront kernel for the extd2 banded dual-affine DP.

Same semantics as ops/extd2_jax.py (itself bit-exact vs ops/ksw2_ref.py,
which is fuzz-verified against the reference SSE kernel
/root/reference/src/kswlib/ksw2_extd2_sse.c:29-260), but the whole
anti-diagonal sweep runs INSIDE one kernel with the DP state resident in
VMEM — the lax.scan version dispatches one tiny (B, T) elementwise pass
per diagonal and is latency-bound on TPU (~0.4 ms/step x 431 steps).

Key structural idea: the per-problem band [st0, en0] at diagonal r
always satisfies st0 >= (r-w+1)>>1 and en0 <= (r+w)>>1 (both bounds are
terms of the reference's max/min), so a GLOBAL window of width
W >= w + 48 anchored at o_r = clamp(align16((r-w+1)>>1) - 16, 0, Tp-W)
covers every problem's band at every diagonal. o_r is a static function
of r, so the whole batch shares one sliding VMEM window and the q/t
reads become plain dynamic slices (no per-problem gathers). This also
makes the kernel's work O(n_diag * W) instead of O(n_diag * T): long
targets cost the same per diagonal as short ones.

Layout: state arrays are (W, BLK) — W on the sublane axis (rolls and
dynamic slices are cheap there), problems on the 128-wide lane axis.
Direction bytes stream to HBM in 16-diagonal chunks via double-buffered
async DMA; traceback is a second kernel that walks the chunks backwards
(each traceback step consumes one diagonal, so the walk visits each
chunk exactly once).

Scoring parameters are compile-time constants (one compiled program per
scoring profile + size class, matching how the engine buckets DP
requests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extd2_jax import Extd2Params, NEG_INF

BLK = 128          # problems per kernel instance (lane width)
DCHUNK = 16        # diagonals per dmat DMA chunk


def _roll(arr, shift, axis, interpret):
    if interpret:
        return jnp.roll(arr, shift, axis=axis)
    return pltpu.roll(arr, shift=shift % arr.shape[axis], axis=axis)


def _leading_gap_delta_scalar(r, p: Extd2Params):
    pn = p.normalized()
    lt = p.long_thres
    ld = p.long_diff
    return jnp.where(
        r == 0, -pn.q - pn.e,
        jnp.where(r < lt, -pn.e, jnp.where(r == lt, ld, -pn.e2)),
    ).astype(jnp.int32)


def _plan(Qmax: int, Tmax: int, W: int):
    t_pad = max(((Tmax + 15) // 16) * 16, W)
    n_diag = Qmax + Tmax - 1
    n_diag_pad = ((n_diag + DCHUNK - 1) // DCHUNK) * DCHUNK
    q_padl = t_pad + 64
    q_ext = q_padl + Qmax + W
    return t_pad, n_diag_pad, q_padl, q_ext


def _fwd_kernel(q_ref, t_ref, qlen_ref, tlen_ref, dmat_ref, out_ref,
                u_ref, v_ref, x_ref, y_ref, x2_ref, y2_ref, s_ref, H_ref,
                dstage_ref, dma_sem,
                *, p: Extd2Params, W: int, n_diag_pad: int, t_pad: int,
                q_padl: int, q_ext: int, Qmax: int, with_dmat: bool,
                interpret: bool, sdt=jnp.int8):
    """sdt: dtype of the difference-recurrence state (u/v/x/y/x2/y2/s).
    The ksw2 recurrence is int8-bounded by construction for the
    realigner's scoring profile (ksw2_extd2_sse.c runs int8 SIMD lanes;
    |state| <= match + q2 + e2 + |mismatch| here) — int8 state means 4x
    the VPU lane width of the round-3 int32 kernel. H (absolute score)
    stays int32. extd2_batch_pallas falls back to int32 state when the
    profile's bound does not fit int8."""
    pn = p.normalized()
    q_, e_, q2_, e2_ = pn.q, pn.e, pn.q2, pn.e2
    g = pl.program_id(0)

    neg1 = jnp.asarray(-q_ - e_, sdt)
    neg2 = jnp.asarray(-q2_ - e2_, sdt)
    u_ref[:] = jnp.full((W, BLK), neg1, sdt)
    v_ref[:] = jnp.full((W, BLK), neg1, sdt)
    x_ref[:] = jnp.full((W, BLK), neg1, sdt)
    y_ref[:] = jnp.full((W, BLK), neg1, sdt)
    x2_ref[:] = jnp.full((W, BLK), neg2, sdt)
    y2_ref[:] = jnp.full((W, BLK), neg2, sdt)
    s_ref[:] = jnp.zeros((W, BLK), sdt)
    H_ref[:] = jnp.full((W, BLK), NEG_INF, jnp.int32)
    # masked-extract fill for sdt state: below every reachable value
    SNEG = jnp.asarray(jnp.iinfo(sdt).min, sdt)

    qlen = qlen_ref[0, 0, :]                   # (BLK,)
    tlen = tlen_ref[0, 0, :]
    tlen_pad16 = ((tlen + 15) // 16) * 16
    kidx = jax.lax.broadcasted_iota(jnp.int32, (W, BLK), 0)   # window row

    NEGI = jnp.int32(NEG_INF)

    def chunk_dma(slot, chunk):
        return pltpu.make_async_copy(
            dstage_ref.at[slot],
            dmat_ref.at[g, pl.ds(chunk * DCHUNK, DCHUNK)],
            dma_sem.at[slot],
        )

    def row_extract(arr, pos, o_r):
        """Per-problem value arr[pos[b] - o_r, b] (dtype-min off-window).
        Mosaic has no int8 reductions, so sdt state reduces through an
        int32 copy and casts back (in-window values fit sdt; the
        off-window fill maps to sdt-min, below every reachable value,
        and every sdt-state caller guards the off-window case anyway)."""
        m = kidx == (pos - o_r)[None, :]
        if arr.dtype == jnp.int32:
            return jnp.max(jnp.where(m, arr, NEGI), axis=0)
        v = jnp.max(jnp.where(m, arr, SNEG).astype(jnp.int32), axis=0)
        return v.astype(arr.dtype)

    def step(r, carry):
        (last_st, last_en, ez_max, ez_max_q, ez_max_t,
         mqe, mqe_t, mte, mte_q, score, zdropped, o_prev) = carry

        o_form = ((r - p.w + 1) >> 1) // 16 * 16 - 16
        o_r = jnp.clip(o_form, 0, t_pad - W)
        slide = o_r != o_prev          # slides by exactly 16 when it moves

        def shifted(ref, fill):
            arr = ref[:]
            sh = _roll(arr, -16, 0, interpret)
            sh = jnp.where(kidx >= W - 16, fill, sh)
            return jnp.where(slide, sh, arr)

        u_arr0 = shifted(u_ref, neg1)
        v_arr = shifted(v_ref, neg1)
        x_arr = shifted(x_ref, neg1)
        y_arr0 = shifted(y_ref, neg1)
        x2_arr = shifted(x2_ref, neg2)
        y2_arr0 = shifted(y2_ref, neg2)
        s_arr = shifted(s_ref, jnp.asarray(0, sdt))
        H_arr = shifted(H_ref, NEGI)

        idx = kidx + o_r               # absolute t coordinate, (W, BLK)

        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1),
                          jax.lax.shift_right_arithmetic(r - p.w + 1, 1))
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r),
                          jax.lax.shift_right_arithmetic(r + p.w, 1))
        in_range = r < qlen + tlen - 1
        band_dead = st0 > en0
        active = in_range & (zdropped == 0) & ~band_dead
        new_zdrop_from_band = in_range & (zdropped == 0) & band_dead

        st = st0 // 16 * 16
        en = jnp.minimum((en0 + 16) // 16 * 16 - 1, tlen_pad16 - 1)

        real = (idx >= st0[None, :]) & (idx <= en0[None, :])
        band = (idx >= st[None, :]) & (idx <= en[None, :])
        activeb = active[None, :]

        # window reads: q[r - idx] and t[idx] as shared dynamic slices
        qstart = jnp.clip(q_padl + Qmax - 1 - r + o_r, 0, q_ext - W)
        qwin = q_ref[0, pl.ds(qstart, W), :]       # (W, BLK): q[r - idx]
        twin = t_ref[0, pl.ds(o_r, W), :]

        s_new = jnp.where(real & activeb,
                          jnp.where(qwin == twin,
                                    jnp.asarray(p.match, sdt),
                                    jnp.asarray(p.mismatch, sdt)),
                          s_arr)

        # top boundary at idx == r (query row 0)
        topm = ((en >= r) & active)[None, :] & (idx == r)
        u_bound = _leading_gap_delta_scalar(r, p).astype(sdt)
        u_arr = jnp.where(topm, u_bound, u_arr0)
        y_arr = jnp.where(topm, neg1, y_arr0)
        y2_arr = jnp.where(topm, neg2, y2_arr0)

        # band-left boundary scalars (per problem); u_bound doubles as the
        # v-boundary default (_leading_gap_delta), as in the scan version
        stale_ok = (st - 1 >= last_st) & (st - 1 <= last_en)
        x_stm1 = row_extract(x_arr, st - 1, o_r)
        x2_stm1 = row_extract(x2_arr, st - 1, o_r)
        v_stm1 = row_extract(v_arr, st - 1, o_r)
        x1 = jnp.where(st > 0, jnp.where(stale_ok, x_stm1, neg1), neg1)
        x21 = jnp.where(st > 0, jnp.where(stale_ok, x2_stm1, neg2), neg2)
        v1 = jnp.where(st > 0, jnp.where(stale_ok, v_stm1, neg1), u_bound)

        def shift1(arr, bval):
            rolled = _roll(arr, 1, 0, interpret)
            return jnp.where(idx == st[None, :], bval[None, :], rolled)

        x_sh = shift1(x_arr, x1)
        v_sh = shift1(v_arr, v1)
        x2_sh = shift1(x2_arr, x21)

        a = x_sh + v_sh
        b = y_arr + u_arr
        a2 = x2_sh + v_sh
        b2 = y2_arr + u_arr
        z = s_new
        d = jnp.zeros((W, BLK), sdt)
        m = a > z
        d = jnp.where(m, 1, d)
        z = jnp.maximum(z, a)
        m = b > z
        d = jnp.where(m, 2, d)
        z = jnp.maximum(z, b)
        m = a2 > z
        d = jnp.where(m, 3, d)
        z = jnp.maximum(z, a2)
        m = b2 > z
        d = jnp.where(m, 4, d)
        z = jnp.maximum(z, b2)
        z = jnp.minimum(z, p.match)

        u_new = z - v_sh
        v_new = z - u_arr
        a = a - (z - q_)
        b = b - (z - q_)
        a2 = a2 - (z - q2_)
        b2 = b2 - (z - q2_)

        x_new = jnp.maximum(a, 0) - q_ - e_
        d = d | jnp.where(a > 0, 0x08, 0)
        y_new = jnp.maximum(b, 0) - q_ - e_
        d = d | jnp.where(b > 0, 0x10, 0)
        x2_new = jnp.maximum(a2, 0) - q2_ - e2_
        d = d | jnp.where(a2 > 0, 0x20, 0)
        y2_new = jnp.maximum(b2, 0) - q2_ - e2_
        d = d | jnp.where(b2 > 0, 0x40, 0)

        wmask = band & activeb
        u_ref[:] = jnp.where(wmask, u_new, u_arr)
        v_ref[:] = jnp.where(wmask, v_new, v_arr)
        x_ref[:] = jnp.where(wmask, x_new, x_arr)
        y_ref[:] = jnp.where(wmask, y_new, y_arr)
        x2_ref[:] = jnp.where(wmask, x2_new, x2_arr)
        y2_ref[:] = jnp.where(wmask, y2_new, y2_arr)
        s_ref[:] = s_new

        # H update (H[en0] uses old H[en0-1]; mid cells use own old H)
        H_prev_en0m1 = row_extract(H_arr, en0 - 1, o_r)
        H_prev_en0 = row_extract(H_arr, en0, o_r)
        u_new_w = jnp.where(band, u_new, NEGI)
        v_new_w = jnp.where(band, v_new, NEGI)
        H_en0 = jnp.where(en0 > 0,
                          H_prev_en0m1 + row_extract(u_new_w, en0, o_r),
                          H_prev_en0 + row_extract(v_new_w, en0, o_r))
        H_mid = jnp.where(real & (idx < en0[None, :]) & activeb,
                          H_arr + v_new, H_arr)
        H_r0 = row_extract(v_new_w, jnp.zeros_like(en0), o_r) - (q_ + e_)
        H_new = jnp.where(
            activeb & (idx == en0[None, :]),
            jnp.where(r == 0, H_r0, H_en0)[None, :],
            jnp.where(r == 0, H_arr, H_mid),
        )
        H_ref[:] = H_new

        # diagonal max with the C scan tie semantics: H[en0] seeds, then
        # the first strictly-greater cell in [st0, en0) wins
        Hmask = jnp.where(real, H_new, NEGI)
        seg_max = jnp.max(Hmask, axis=0)
        first_t = jnp.min(
            jnp.where(Hmask == seg_max[None, :], idx, jnp.int32(0x7FFFFFFF)),
            axis=0,
        )
        H_new_en0 = row_extract(H_new, en0, o_r)
        max_t = jnp.where(H_new_en0 == seg_max, en0, first_t)
        max_H = seg_max

        mte_hit = active & (en0 == tlen - 1) & (H_new_en0 > mte)
        mte_n = jnp.where(mte_hit, H_new_en0, mte)
        mte_q_n = jnp.where(mte_hit, r - en, mte_q)
        H_new_st0 = row_extract(H_new, st0, o_r)
        mqe_hit = active & (r - st0 == qlen - 1) & (H_new_st0 > mqe)
        mqe_n = jnp.where(mqe_hit, H_new_st0, mqe)
        mqe_t_n = jnp.where(mqe_hit, st0, mqe_t)

        better = max_H > ez_max
        ez_max_n = jnp.where(active & better, max_H, ez_max)
        ez_max_t_n = jnp.where(active & better, max_t, ez_max_t)
        ez_max_q_n = jnp.where(active & better, r - max_t, ez_max_q)
        tl_ = max_t - ez_max_t
        ql_ = (r - max_t) - ez_max_q
        l_ = jnp.abs(tl_ - ql_)
        drop_check = active & ~better & (max_t >= ez_max_t) & \
            (r - max_t >= ez_max_q)
        dropped_now = drop_check & (p.zdrop >= 0) & \
            (ez_max - max_H > p.zdrop + l_ * e2_)
        zdropped_n = jnp.where(
            dropped_now | new_zdrop_from_band, 1, zdropped
        ).astype(jnp.int32)

        score_hit = active & ~dropped_now & (r == qlen + tlen - 2) & \
            (en0 == tlen - 1)
        H_new_tl = row_extract(H_new, tlen - 1, o_r)
        score_n = jnp.where(score_hit, H_new_tl, score)

        if with_dmat:
            d_out = jnp.where(wmask, d, 0).astype(jnp.uint8)
            chunk = r // DCHUNK
            slot = chunk % 2

            @pl.when((r % DCHUNK == 0) & (chunk >= 2))
            def _():
                chunk_dma(slot, chunk - 2).wait()

            dstage_ref[slot, r % DCHUNK] = d_out

            @pl.when(r % DCHUNK == DCHUNK - 1)
            def _():
                chunk_dma(slot, chunk).start()

        return (jnp.where(active, st, last_st),
                jnp.where(active, en, last_en),
                ez_max_n, ez_max_q_n, ez_max_t_n,
                mqe_n, mqe_t_n, mte_n, mte_q_n,
                score_n, zdropped_n, o_r)

    mi = jnp.full((BLK,), -1, jnp.int32)
    ni = jnp.full((BLK,), NEG_INF, jnp.int32)
    # o_prev starts at -1: the spurious "slide" it triggers at r=0 rolls a
    # window whose cells are all identical init values — a content no-op
    carry0 = (mi, mi,
              jnp.zeros((BLK,), jnp.int32), mi, mi,
              ni, mi, ni, mi,
              ni, jnp.zeros((BLK,), jnp.int32),
              jnp.int32(-1))
    # dynamic diagonal bound: this block only sweeps to its own longest
    # problem (rounded to the dmat DMA chunk). Lanes are dead past
    # qlen+tlen-1 anyway (active=false), so the cut is exact; callers
    # sort requests by size so blocks are homogeneous and the bulk of
    # the padded class sweep disappears (probe 2026-08-20: the 48x64
    # class ran 112 diagonals for a median 14x29 problem).
    n_act = jnp.clip(
        ((jnp.max(qlen + tlen) - 1 + DCHUNK - 1) // DCHUNK) * DCHUNK,
        DCHUNK, n_diag_pad)
    carry = jax.lax.fori_loop(0, n_act, step, carry0,
                              unroll=False)
    (last_st, last_en, ez_max, ez_max_q, ez_max_t,
     mqe, mqe_t, mte, mte_q, score, zdropped, _o) = carry

    if with_dmat:
        nchunks = n_act // DCHUNK

        @pl.when(nchunks >= 2)
        def _():
            chunk_dma(nchunks % 2, nchunks - 2).wait()

        chunk_dma((nchunks - 1) % 2, nchunks - 1).wait()

    out_ref[0, 0, :] = score
    out_ref[0, 1, :] = mqe
    out_ref[0, 2, :] = mqe_t
    out_ref[0, 3, :] = mte
    out_ref[0, 4, :] = mte_q
    out_ref[0, 5, :] = ez_max
    out_ref[0, 6, :] = ez_max_q
    out_ref[0, 7, :] = ez_max_t
    out_ref[0, 8, :] = zdropped
    out_ref[0, 9:16, :] = jnp.zeros((7, BLK), jnp.int32)


class PallasExtd2Result(NamedTuple):
    score: jnp.ndarray
    mqe: jnp.ndarray
    mqe_t: jnp.ndarray
    mte: jnp.ndarray
    mte_q: jnp.ndarray
    max: jnp.ndarray
    max_q: jnp.ndarray
    max_t: jnp.ndarray
    zdropped: jnp.ndarray
    dmat: jnp.ndarray      # (G, n_diag_pad, W, BLK) uint8, band-relative


def state_fits_int8(params: Extd2Params) -> bool:
    """Whether the difference-recurrence state is int8-bounded for this
    scoring profile: u/v in [-(q2+e2), match+q2+e2], x/y in [-(q+e), -e],
    x2/y2 in [-(q2+e2), -e2], with intermediates bounded by
    (q+e)+(q2+e2)+match (see _fwd_kernel docstring)."""
    pn = params.normalized()
    return (pn.match - pn.mismatch + pn.q + pn.e + pn.q2 + pn.e2) <= 120


@functools.partial(
    jax.jit,
    static_argnames=("params", "W", "with_dmat", "interpret", "state8"),
)
def extd2_batch_pallas(q_codes, qlens, t_codes, tlens,
                       params: Extd2Params = Extd2Params(),
                       W: int = 256, with_dmat: bool = True,
                       interpret: bool = False,
                       state8: bool | None = None) -> PallasExtd2Result:
    """q_codes (B, Qmax) int32 0..3, t_codes (B, Tmax); B % BLK == 0.

    W must be a multiple of 16 with W >= min(w + 48, ceil16(Tmax)) — the
    shared-window coverage bound (see module docstring). state8 runs the
    recurrence in int8 lanes (4x VPU width; default when the scoring
    profile is int8-bounded)."""
    B, Qmax = q_codes.shape
    Tmax = t_codes.shape[1]
    assert B % BLK == 0, "batch must be a multiple of BLK"
    t_pad, n_diag_pad, q_padl, q_ext = _plan(Qmax, Tmax, W)
    assert W % 16 == 0 and (W >= params.w + 48 or W >= t_pad)
    if state8 is None:
        # int8 lanes are semantically valid for the realigner profile
        # (state_fits_int8 + interpret-mode parity in
        # tests/test_extd2_pallas.py), but the current Mosaic/libtpu in
        # this image cannot COMPILE sub-int32 VPU arithmetic at all —
        # probed 2026-08-20: int8/int16 add/max/cmp/roll all fail to
        # lower (tools/probe notes in PERF.md). Default to int32 on
        # compiled backends until the toolchain supports narrow lanes;
        # pass state8=True to A/B once it does.
        state8 = False
    sdt = jnp.int8 if state8 else jnp.int32
    G = B // BLK

    # transposed/padded device-side inputs: (G, rows, BLK)
    qr = q_codes[:, ::-1].astype(jnp.int32)
    q_full = jnp.zeros((B, q_ext), jnp.int32)
    q_full = jax.lax.dynamic_update_slice(q_full, qr, (0, q_padl))
    q_t = q_full.T.reshape(q_ext, G, BLK).transpose(1, 0, 2)
    t_full = jnp.zeros((B, t_pad), jnp.int32)
    t_full = jax.lax.dynamic_update_slice(
        t_full, t_codes.astype(jnp.int32), (0, 0))
    t_t = t_full.T.reshape(t_pad, G, BLK).transpose(1, 0, 2)
    ql_t = qlens.astype(jnp.int32).reshape(G, 1, BLK)
    tl_t = tlens.astype(jnp.int32).reshape(G, 1, BLK)

    kern = functools.partial(
        _fwd_kernel, p=params, W=W, n_diag_pad=n_diag_pad, t_pad=t_pad,
        q_padl=q_padl, q_ext=q_ext, Qmax=Qmax, with_dmat=with_dmat,
        interpret=interpret, sdt=sdt,
    )
    dmat_shape = (G, n_diag_pad, W, BLK) if with_dmat \
        else (G, DCHUNK, W, BLK)
    bspec = lambda rows: pl.BlockSpec((1, rows, BLK), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    dmat, out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[bspec(q_ext), bspec(t_pad), bspec(1), bspec(1)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            bspec(16),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(dmat_shape, jnp.uint8),
            jax.ShapeDtypeStruct((G, 16, BLK), jnp.int32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((W, BLK), sdt) for _ in range(7)]
            + [pltpu.VMEM((W, BLK), jnp.int32)]       # H
            + [pltpu.VMEM((2, DCHUNK, W, BLK), jnp.uint8),
               pltpu.SemaphoreType.DMA((2,))]
        ),
        interpret=interpret,
    )(q_t, t_t, ql_t, tl_t)

    fl = lambda row: out[:, row, :].reshape(B)
    return PallasExtd2Result(
        score=fl(0), mqe=fl(1), mqe_t=fl(2), mte=fl(3), mte_q=fl(4),
        max=fl(5), max_q=fl(6), max_t=fl(7), zdropped=fl(8) > 0,
        dmat=dmat,
    )


# -------------------------------------------------------------------------
# traceback kernel: walks diagonals backwards, one diagonal per step
# -------------------------------------------------------------------------

def _tb_kernel(qlen_ref, tlen_ref, i0_ref, j0_ref, dmat_ref,
               ops_ref, fin_ref, stage_ref, ops_acc_ref, dma_sem,
               *, p: Extd2Params, W: int, n_diag_pad: int,
               t_pad: int):
    g = pl.program_id(0)
    qlen = qlen_ref[0, 0, :]
    tlen = tlen_ref[0, 0, :]
    tlen_pad16 = ((tlen + 15) // 16) * 16
    kidx = jax.lax.broadcasted_iota(jnp.int32, (W, BLK), 0)

    def in_dma(slot, chunk):
        return pltpu.make_async_copy(
            dmat_ref.at[g, pl.ds(chunk * DCHUNK, DCHUNK)],
            stage_ref.at[slot],
            dma_sem.at[slot],
        )

    # dynamic top: the walk starts at this block's highest populated
    # diagonal (max i0+j0; dead lanes carry -1/-1), mirroring the
    # forward kernel's dynamic sweep bound — rows above start as 3s
    i0 = i0_ref[0, 0, :]
    j0 = j0_ref[0, 0, :]
    n_act = jnp.clip(
        ((jnp.max(i0 + j0) + 1 + DCHUNK - 1) // DCHUNK) * DCHUNK,
        DCHUNK, n_diag_pad)
    nchunks = n_act // DCHUNK
    ops_acc_ref[:] = jnp.full((n_diag_pad, BLK), 3, jnp.int32)

    # prefetch the last two chunks (the walk goes backwards)
    in_dma((nchunks - 1) % 2, nchunks - 1).start()

    @pl.when(nchunks >= 2)
    def _():
        in_dma((nchunks - 2) % 2, nchunks - 2).start()

    def step(k, carry):
        i, j, state, alive = carry
        r = n_diag_pad - 1 - k
        chunk = r // DCHUNK
        slot = chunk % 2

        @pl.when(r % DCHUNK == DCHUNK - 1)
        def _():
            in_dma(slot, chunk).wait()

        o_form = ((r - p.w + 1) >> 1) // 16 * 16 - 16
        o_r = jnp.clip(o_form, 0, t_pad - W)

        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1),
                          jax.lax.shift_right_arithmetic(r - p.w + 1, 1))
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r),
                          jax.lax.shift_right_arithmetic(r + p.w, 1))
        st = st0 // 16 * 16
        en = jnp.minimum((en0 + 16) // 16 * 16 - 1, tlen_pad16 - 1)

        here = (alive != 0) & (i + j == r)
        diag = stage_ref[slot, r % DCHUNK]         # (W, BLK) uint8
        dm = jnp.max(
            jnp.where(kidx == (i - o_r)[None, :],
                      diag.astype(jnp.int32), 0),
            axis=0,
        )
        force = jnp.where(i < st, 2, jnp.where(i > en, 1, -1))
        tmp = jnp.where(force < 0, dm, 0)
        st1 = jnp.where(state == 0, tmp & 7, state)
        cont = jax.lax.shift_right_logical(tmp, st1 + 2) & 1
        st2 = jnp.where((state != 0) & (cont == 0), 0, st1)
        st3 = jnp.where(st2 == 0, tmp & 7, st2)
        st4 = jnp.where(force >= 0, force, st3)
        op = jnp.where(st4 == 0, 0,
                       jnp.where((st4 == 1) | (st4 == 3), 2, 1))
        i_n = jnp.where(op != 1, i - 1, i)
        j_n = jnp.where(op != 2, j - 1, j)
        emitted = jnp.where(here, op, 3)
        alive_n = jnp.where(
            here, ((i_n >= 0) & (j_n >= 0)).astype(jnp.int32), alive
        )

        # int32 accumulation row (int8 rows would violate Mosaic's 4-row
        # sublane tiling for single-row updates); whole array converts to
        # int8 once at the end
        ops_acc_ref[r, :] = emitted

        # leaving this chunk: queue the chunk two below into the slot we
        # just finished reading
        @pl.when((r % DCHUNK == 0) & (chunk >= 2))
        def _():
            in_dma(slot, chunk - 2).start()

        return (jnp.where(here, i_n, i), jnp.where(here, j_n, j),
                jnp.where(here, st4, state), alive_n)

    alive0 = ((i0 >= 0) & (j0 >= 0)).astype(jnp.int32)
    i_f, j_f, _, _ = jax.lax.fori_loop(
        n_diag_pad - n_act, n_diag_pad, step,
        (i0, j0, jnp.zeros((BLK,), jnp.int32), alive0),
    )

    ops_ref[0] = ops_acc_ref[:].astype(jnp.int8)
    fin_ref[0, 0, :] = i_f
    fin_ref[0, 1, :] = j_f


@functools.partial(
    jax.jit, static_argnames=("params", "W", "n_diag_pad", "Tmax",
                              "interpret"),
)
def traceback_batch_pallas(dmat, qlens, tlens, i0, j0,
                           params: Extd2Params, W: int, n_diag_pad: int,
                           Tmax: int, interpret: bool = False):
    """Walk direction bytes backwards. Returns ops (B, n_diag_pad) int8
    in walk order (descending diagonal; 3 = no-op at that diagonal; use
    ops_to_cigar_skip), plus the final (i, j) per problem."""
    G = dmat.shape[0]
    B = G * BLK
    t_pad = max(((Tmax + 15) // 16) * 16, W)
    kern = functools.partial(
        _tb_kernel, p=params, W=W, n_diag_pad=n_diag_pad, t_pad=t_pad,
    )
    bspec = lambda rows: pl.BlockSpec((1, rows, BLK), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    ops, fin = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[bspec(1), bspec(1), bspec(1), bspec(1),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            bspec(n_diag_pad),
            bspec(2),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, n_diag_pad, BLK), jnp.int8),
            jax.ShapeDtypeStruct((G, 2, BLK), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, DCHUNK, W, BLK), jnp.uint8),
            pltpu.VMEM((n_diag_pad, BLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qlens.astype(jnp.int32).reshape(G, 1, BLK),
      tlens.astype(jnp.int32).reshape(G, 1, BLK),
      i0.astype(jnp.int32).reshape(G, 1, BLK),
      j0.astype(jnp.int32).reshape(G, 1, BLK), dmat)
    # memory order is ascending r; walk order is descending r
    ops_b = ops.transpose(0, 2, 1).reshape(B, n_diag_pad)[:, ::-1]
    i_f = fin[:, 0, :].reshape(B)
    j_f = fin[:, 1, :].reshape(B)
    return ops_b, i_f, j_f


def ops_to_cigar_skip(ops_row: np.ndarray, i_fin: int, j_fin: int) -> list:
    """Backward op codes (3 = skip) -> forward run-length CIGAR with the
    ksw_backtrack_D leading-gap tail. Same contract as
    extd2_jax.ops_to_cigar but 3s are interleaved, not terminal."""
    out: list[tuple[str, int]] = []
    names = "MID"
    for code in ops_row:
        if code == 3:
            continue
        op = names[code]
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + 1)
        else:
            out.append((op, 1))
    if i_fin >= 0:
        if out and out[-1][0] == "D":
            out[-1] = ("D", out[-1][1] + i_fin + 1)
        else:
            out.append(("D", int(i_fin) + 1))
    if j_fin >= 0:
        if out and out[-1][0] == "I":
            out[-1] = ("I", out[-1][1] + j_fin + 1)
        else:
            out.append(("I", int(j_fin) + 1))
    return out[::-1]
