"""Device-side chain selection + path compaction for the collect walk.

Round-4 shipped the full (2*n_pad, K) chain tensors (seed geometry +
pre-pointers + hit lists, ~1.6 MB per 8,192-read batch) across the link
so the C++ collect walk (native/engine_glue.cpp score_chain, mirroring
read_realignment.cpp:306-400) could chase pre-pointers on the host. But
the walk only ever touches the nodes on the KEPT chains' paths — ~2
nodes per chain, ~1.5 chains per chain-bearing read. This module runs
the per-read chain selection (engine._finish_batch's loop /
glue_collect's extraction, semantics of read_realignment.cpp:212-293 +
hpp break rules) and the pre-pointer path gather ON DEVICE, compacting
the selected chains and their path nodes onto flat lanes — the fused
result buffer then carries ~12 B per chain + 10 B per path node instead
of 11 B per (row, seed-slot) lane.

Selection semantics (bit-identical to glue_collect, tested):
  per read, candidates are the two directions' hit lists in order
  (fwd hits 0..5 then rev 0..5); a running max over the candidates seen
  so far drives the per-direction break rule
  (cs + MAX_CHAIN_SCORE_DIFF < max  or  cs < MIN_CHAIN_SCORE_LOOP);
  survivors sort by (-chain_score, hit_idx, candidate-order) and are
  kept while within MAX_CHAIN_SCORE_DIFF of the global max; a read
  participates iff its global max >= MIN_CHAIN_SCORE.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_CHAIN_SCORE = 20         # host_align.py:41 (hpp:31)
MAX_CHAIN_SCORE_DIFF = 30    # cpp:396
MIN_CHAIN_SCORE_LOOP = 30    # cpp:397
N_HIT = 6


class CollectOut(NamedTuple):
    """Compacted selected chains + path nodes (flat lanes).

    chain_meta: (NC, 3) int32 [read | dir<<15 | plen<<16,
                               cs | read_bg<<16, ref_begin0]
    path_a:     (NP,) int32  rb | re<<16  (node read span)
    path_b:     (NP,) int32  fb           (node ref begin)
    path_dfe:   (NP,) int32  fe - fb      (node ref span; int16 range)
    n_chains:   () int32
    n_nodes:    () int32
    over:       (n_pad,) int32  reads whose chains/paths missed the
                NC/NP budgets (host-fallback; exactness preserved)
    """
    chain_meta: jnp.ndarray
    path_a: jnp.ndarray
    path_b: jnp.ndarray
    path_dfe: jnp.ndarray
    n_chains: jnp.ndarray
    n_nodes: jnp.ndarray
    over: jnp.ndarray


def _bump_map(cum_take: jnp.ndarray, NF: int, nmax: int) -> jnp.ndarray:
    """flat slot -> owner: #owners whose inclusive cumsum <= slot (the
    scatter-add + cumsum step-function trick from seed_reads_flat)."""
    bump = (
        jnp.zeros((NF + 1,), jnp.int32)
        .at[jnp.minimum(cum_take, NF)]
        .add(1, mode="drop")
    )
    return jnp.minimum(jnp.cumsum(bump)[:NF], nmax - 1)


@functools.partial(jax.jit, static_argnames=("n_pad", "NC", "NP"))
def select_and_paths(
    rb, re_, fb, fe, pre,          # (R, K) int32 chain tensors
    hit_idx, hit_score, hit_final,  # (R, 6) int32
    active_words,                   # (ceil(n_pad/32),) int32 bitmask
    rid,                            # (R,) int32 row map or None
    n_pad: int,
    NC: int,
    NP: int,
) -> CollectOut:
    R, K = rb.shape
    B2 = 2 * n_pad

    # ---- row -> compact slot map (identity when uncompacted) -----------
    if rid is not None:
        inv = (jnp.full((B2 + 1,), R, jnp.int32)
               .at[jnp.clip(rid, 0, B2)]
               .set(jnp.arange(R, dtype=jnp.int32), mode="drop"))[:B2]
        slot_f = inv[:n_pad]
        slot_r = inv[n_pad:]
        # pad row R = "missing": gather with clip + mask
        hs_pad = jnp.concatenate([hit_score, jnp.zeros((1, N_HIT), hit_score.dtype)])
        hi_pad = jnp.concatenate([hit_idx, jnp.full((1, N_HIT), -1, hit_idx.dtype)])
        hf_pad = jnp.concatenate([hit_final, jnp.zeros((1, N_HIT), hit_final.dtype)])

        def hrow(slot):
            return hi_pad[slot], hs_pad[slot], hf_pad[slot]
    else:
        slot_f = jnp.arange(n_pad, dtype=jnp.int32)
        slot_r = slot_f + n_pad

        def hrow(slot):
            return hit_idx[slot], hit_score[slot], hit_final[slot]

    hi_f, hs_f, hf_f = hrow(slot_f)            # (n_pad, 6)
    hi_r, hs_r, hf_r = hrow(slot_r)

    cols = np.arange(n_pad, dtype=np.int32)
    active = ((active_words[cols >> 5] >> jnp.asarray(cols & 31)) & 1) != 0

    # candidate order j = d*6 + s (fwd hits first, as the C++ loop)
    cand_cs = jnp.concatenate([hs_f, hs_r], axis=1).astype(jnp.int32)
    cand_hi = jnp.concatenate([hi_f, hi_r], axis=1).astype(jnp.int32)
    cand_fin = jnp.concatenate([hf_f, hf_r], axis=1).astype(jnp.int32)
    # hits are front-packed; treat as prefix per direction anyway
    pref_f = jnp.cumprod((hi_f >= 0).astype(jnp.int32), axis=1) != 0
    pref_r = jnp.cumprod((hi_r >= 0).astype(jnp.int32), axis=1) != 0
    present = jnp.concatenate([pref_f, pref_r], axis=1)

    # ---- running-max / break loop (12 unrolled steps) -------------------
    run_max = jnp.zeros((n_pad,), jnp.int32)
    broken = jnp.zeros((n_pad, 2), bool)
    keep_cols = []
    for j in range(2 * N_HIT):
        d = j // N_HIT
        cs = cand_cs[:, j]
        p = present[:, j] & ~broken[:, d]
        run_max = jnp.where(p, jnp.maximum(run_max, cs), run_max)
        broke = (cs + MAX_CHAIN_SCORE_DIFF < run_max) \
            | (cs < MIN_CHAIN_SCORE_LOOP)
        keep_cols.append(p & ~broke)
        broken = broken.at[:, d].set(broken[:, d] | (p & broke))
    keep = jnp.stack(keep_cols, axis=1)                     # (n_pad, 12)
    gmax = run_max

    # ---- sort candidates by (-cs, hit_idx, j); invalid last -------------
    i32max = jnp.int32(0x7FFFFFFF)
    j_arr = jnp.arange(2 * N_HIT, dtype=jnp.int32)[None, :]
    key = ((jnp.int32(8191) - jnp.clip(cand_cs, 0, 8191)) << 11) \
        | (jnp.clip(cand_hi, 0, 127) << 4) | j_arr
    key = jnp.where(keep, key, i32max)
    key_s, j_s = jax.lax.sort((key, jnp.broadcast_to(j_arr, key.shape)),
                              dimension=1, num_keys=1)
    at = lambda a: jnp.take_along_axis(a, j_s, axis=1)
    cs_s = at(cand_cs)
    hi_s = at(cand_hi)
    fin_s = at(cand_fin)
    d_s = j_s // N_HIT

    read_ok = active & (gmax >= MIN_CHAIN_SCORE) & keep.any(axis=1)
    sel = (key_s != i32max) & read_ok[:, None] \
        & (cs_s + MAX_CHAIN_SCORE_DIFF >= gmax[:, None])
    # sel is a prefix per row (sorted desc by cs; violations sort after)
    n_sel = jnp.sum(sel, axis=1).astype(jnp.int32)

    # ---- compact chains onto NC flat lanes (read-major) -----------------
    cum_read = jnp.cumsum(n_sel)
    read_off = cum_read - n_sel
    total_chains = cum_read[-1]
    read_fits = cum_read <= NC
    c_lane = jnp.arange(NC, dtype=jnp.int32)
    c_read = _bump_map(cum_read, NC, n_pad)
    c_slot = c_lane - read_off[c_read]
    c_ok = (c_lane < jnp.minimum(total_chains, NC)) \
        & (c_slot >= 0) & (c_slot < n_sel[c_read])

    g2 = lambda a: a[c_read, jnp.clip(c_slot, 0, 2 * N_HIT - 1)]
    c_cs = jnp.where(c_ok, g2(cs_s), 0)
    c_hi = jnp.where(c_ok, g2(hi_s), 0)
    c_fin = jnp.where(c_ok, g2(fin_s), 0)
    c_dir = jnp.where(c_ok, g2(d_s), 0)

    # chain's compact row (for rb/fb/pre gathers)
    if rid is not None:
        c_row = jnp.where(c_dir == 0, slot_f[c_read], slot_r[c_read])
        c_row = jnp.clip(c_row, 0, R - 1)   # selected rows always mapped
    else:
        c_row = c_read + c_dir * n_pad

    flat = lambda a, node: a[c_row, jnp.clip(node, 0, K - 1)]
    c_read_bg = jnp.where(c_ok, flat(rb, c_fin), 0)
    c_ref_begin0 = jnp.where(c_ok, flat(fb, c_fin), 0)

    # ---- path walk: follow pre from the hit node ------------------------
    node = jnp.where(c_ok, c_hi, -1)
    steps_a = []
    steps_b = []
    steps_d = []
    alive_cols = []
    plen = jnp.zeros((NC,), jnp.int32)
    for _ in range(K):
        alive = node >= 0
        nodec = jnp.clip(node, 0, K - 1)
        a = rb[c_row, nodec] | (re_[c_row, nodec] << 16)
        b = fb[c_row, nodec]
        dd = fe[c_row, nodec] - b
        steps_a.append(jnp.where(alive, a, 0))
        steps_b.append(jnp.where(alive, b, 0))
        steps_d.append(jnp.where(alive, dd, 0))
        alive_cols.append(alive)
        plen = plen + alive.astype(jnp.int32)
        node = jnp.where(alive, pre[c_row, nodec], -1)
    pa = jnp.stack(steps_a, axis=1)                        # (NC, K)
    pb = jnp.stack(steps_b, axis=1)
    pd = jnp.stack(steps_d, axis=1)

    # ---- compact path nodes onto NP flat lanes ---------------------------
    cum_nodes = jnp.cumsum(plen)
    node_off = cum_nodes - plen
    total_nodes = cum_nodes[-1]
    chain_fits = cum_nodes <= NP
    p_lane = jnp.arange(NP, dtype=jnp.int32)
    p_chain = _bump_map(cum_nodes, NP, NC)
    p_step = p_lane - node_off[p_chain]
    p_ok = (p_lane < jnp.minimum(total_nodes, NP)) \
        & (p_step >= 0) & (p_step < plen[p_chain])
    gp = lambda a: jnp.where(
        p_ok, a[p_chain, jnp.clip(p_step, 0, K - 1)], 0)
    path_a = gp(pa)
    path_b = gp(pb)
    path_dfe = gp(pd)

    # ---- budget overflow -> per-read host fallback -----------------------
    # a read is OVER if its chains spill NC, or any of its chains' path
    # nodes spill NP
    chain_read_over = read_ok & ~read_fits
    # chain lane -> its read; mark reads whose chains don't fit NP
    bad_chain = c_ok & ~chain_fits
    path_read_over = (
        jnp.zeros((n_pad,), bool)
        .at[jnp.where(bad_chain, c_read, n_pad)]
        .set(True, mode="drop")
    )
    over = (chain_read_over | path_read_over).astype(jnp.int32)
    # over-budget reads' chains carry a SKIP bit (bit 24) instead of
    # being dropped: their path nodes still occupy NP lanes, so the C++
    # side must advance its path cursor by plen while skipping the walk
    # (the host recomputes those reads exactly)
    c_over = over[c_read] != 0
    meta0 = jnp.where(
        c_ok,
        c_read | (c_dir << 15) | (jnp.clip(plen, 0, 255) << 16)
        | (c_over.astype(jnp.int32) << 24),
        -1,
    )
    meta1 = jnp.where(c_ok, (c_cs & 0xFFFF) | (c_read_bg << 16), 0)
    meta2 = jnp.where(c_ok, c_ref_begin0, 0)
    chain_meta = jnp.stack([meta0, meta1, meta2], axis=1)

    # scalars: clipped lane counts + TRUE totals (the engine sizes the
    # next compile's budgets directly from the unclipped demand)
    return CollectOut(
        chain_meta=chain_meta,
        path_a=path_a, path_b=path_b, path_dfe=path_dfe,
        n_chains=jnp.stack([jnp.minimum(total_chains, NC), total_chains]),
        n_nodes=jnp.stack([jnp.minimum(total_nodes, NP), total_nodes]),
        over=over,
    )
