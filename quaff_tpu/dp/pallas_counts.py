"""Pallas training E-step: forward + backward-with-counts kernels.

The XLA forward-backward (dp/counts.py) is the f64 parity path; this is
the TPU production E-step.  Two kernels:

1. forward: the v2 banded fill, additionally streaming each row's three
   state vectors to HBM ([Ly, B, W] each — the checkpoint the backward
   pass reads; ~4 bytes/cell, well within HBM for training batch sizes).
2. backward: runs the band in reverse row order, carrying the backward
   state in VMEM, re-resolving emissions with the same one-hot MXU dots,
   computing per-cell posterior transition weights
   exp(fwd_src + trans + back_dest - fwd_total)  (transCount,
   qmodel.cpp:1505-1510), weighting each pair by a caller-provided
   posterior (the read-level responsibility exp(fwd_b - y_loglike), which
   subsumes the reference's Δ=20 skip), and accumulating the results
   directly into small VMEM count tables:
     d_emis [Km, 4*QP] (split layout: block s holds symbol-s counts per
                        (kmer, qual) — mirrors the emission tables)
     d_insv [8, QP]    (rows 0-3: insert counts per (token, qual))
     d_ik   [Ki, 8]   (cols 0-3: m2m / m2i / m2d / m2e)
     d_sc   [8, B]    (rows 0-3: i2i / i2m / d2d / d2m, per pair;
                       row 4: back-score contribution at j=1)
   The cross-pair reduction uses transposed one-hot matmuls — the same
   restructuring of the reference's per-cell scatter as dp/counts.py, but
   fused into the backward sweep.

The returned count tables equal
  sum_b w[b] * counts_pair(b)
to f32 accuracy, where counts_pair matches dp_forward_backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import QUAL_SCORE_RANGE
from .pallas_v2 import (
    K_IK_CUR,
    K_IK_PREV,
    K_KQ,
    K_NEWTOK,
    K_OLDTOK0,
    K_TQ,
    MAX_SEGS,
    NEG_INF,
    NUM_KEYS,
    QP,
    VMEM_LIMIT_BYTES,
    V2Tables,
    _advance_window,
    _lane_tables,
    _lse2_fast,
    _prepare_device,
    _round_up,
    _segment_arrays,
    _sel_dot_exact,
    _split_emission_lookup,
)

_DOT = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
_B_CONTRACT = (((0,), (0,)), ((), ()))  # contract over the batch axis




def _emission_lookup(keys_ref, emis_ref, insv_ref, ik_ref, B, n_ik=0):
    """Shared emission/transition resolution via the split lookup
    (pallas_v2._split_emission_lookup); returns
    (emit_cols 4-tuple of [B,1], ins_emit [B,1], tr_prev, tr_cur,
    oh_k [B,Km], oh_q [B,QP], oh_t [B,8], oh_prev, oh_cur).
    tr_prev/tr_cur are [B,8] — except at n_ik == 1 (gap order 0, the
    default), where the single indel context makes the lookup trivial:
    the one-hot dots are skipped (oh_prev/oh_cur None)."""
    emit_cols, ins_emit, oh_k, oh_q, oh_t = _split_emission_lookup(
        keys_ref, emis_ref, insv_ref, 0, B
    )
    if n_ik == 1:
        # kernels read the transition scalars straight from ik_ref
        return emit_cols, ins_emit, None, None, oh_k, oh_q, oh_t, None, None
    ki = ik_ref.shape[0]
    ik_prev = keys_ref[0, K_IK_PREV, :]
    ik_cur = keys_ref[0, K_IK_CUR, :]
    oh_prev = (
        jax.lax.broadcasted_iota(jnp.int32, (B, ki), 1) == ik_prev[:, None]
    ).astype(jnp.float32)
    oh_cur = (
        jax.lax.broadcasted_iota(jnp.int32, (B, ki), 1) == ik_cur[:, None]
    ).astype(jnp.float32)
    tr_prev = _sel_dot_exact(oh_prev, ik_ref[:])
    tr_cur = _sel_dot_exact(oh_cur, ik_ref[:])
    return emit_cols, ins_emit, tr_prev, tr_cur, oh_k, oh_q, oh_t, oh_prev, oh_cur


def _select_emit(win, emit_cols, B, W):
    emit = jnp.where(win == 0.0, emit_cols[0], NEG_INF)
    for a in (1, 2, 3):
        emit = jnp.where(win == float(a), emit_cols[a], emit)
    return emit


def _fwd_kernel(
    keys_ref, emis_ref, insv_ref, ik_ref, member_ref, xs0_ref, meta_ref,
    doff_ref, snew_ref,
    out_ref, mrow_ref, irow_ref, drow_ref,
    mat_ref, ins_ref, del_ref, win_ref,
    *, width: int, local: bool,
    n_segs: int = MAX_SEGS, n_ik: int = 0,
):
    j0 = pl.program_id(0)
    # gap transitions ride meta rows 3-6 (set per call) rather than being
    # baked into the compiled program: EM updates them every iteration,
    # and a static tuple would force a recompile per E-step dispatch
    d2d = meta_ref[3, :][:, None]
    d2m = meta_ref[4, :][:, None]
    i2i = meta_ref[5, :][:, None]
    i2m = meta_ref[6, :][:, None]
    B = member_ref.shape[0]
    W = width
    lse = _lse2_fast

    @pl.when(j0 == 0)
    def _init():
        neg = jnp.full((B, W), NEG_INF, jnp.float32)
        mat_ref[:] = neg
        ins_ref[:] = neg
        del_ref[:] = neg
        out_ref[:] = neg
        win_ref[:] = xs0_ref[:]

    @pl.when(j0 > 0)
    def _advance():
        _advance_window(win_ref, keys_ref, snew_ref, 0, B, W, n_segs)

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    x_len = meta_ref[1, :][:, None]
    y_len = meta_ref[2, :][:, None]
    jf = (j0 + 1).astype(jnp.float32)
    idx = doff_ref[:] + (jf - 1.0)
    valid = (member_ref[:] > 0.5) & (idx >= 0.0) & (idx < x_len) & (jf <= y_len)

    emit_cols, ins_emit, tr_prev, tr_cur, *_ = _emission_lookup(
        keys_ref, emis_ref, insv_ref, ik_ref, B, n_ik
    )
    if n_ik == 1:
        # single indel context: plain scalar reads (a [1,1] slice would
        # need a both-axes broadcast, which Mosaic does not implement)
        m2m_j = ik_ref[0, 0]
        m2i_j = ik_ref[0, 1]
        m2d_j = ik_ref[0, 2]
        m2e_j = ik_ref[0, 3]
    else:
        m2m_j = tr_prev[:, 0][:, None]
        m2i_j = tr_prev[:, 1][:, None]
        m2d_j = tr_cur[:, 2][:, None]
        m2e_j = tr_cur[:, 3][:, None]
    emit = _select_emit(win_ref[:], emit_cols, B, W)

    mat_p = mat_ref[:]
    ins_p = ins_ref[:]
    del_p = del_ref[:]

    mat_c = lse(lse(mat_p + m2m_j, del_p + d2m), ins_p + i2m)
    is_first = jf == 1.0
    start_ok = (
        jnp.broadcast_to(is_first, (B, W)) if local else (is_first & (idx == 0.0))
    )
    mat_c = lse(mat_c, jnp.where(start_ok, 0.0, NEG_INF))
    mat_c = jnp.where(valid, mat_c + emit, NEG_INF)

    def shift_hi(v):
        return jnp.where(lane == W - 1, NEG_INF, pltpu.roll(v, jnp.int32(W - 1), 1))

    def shift_lo(v):
        return jnp.where(lane == 0, NEG_INF, pltpu.roll(v, jnp.int32(1), 1))

    ins_c = ins_emit + lse(shift_hi(ins_p) + i2i, shift_hi(mat_p) + m2i_j)
    ins_c = jnp.where(valid, ins_c, NEG_INF)

    c_vec = jnp.where(valid, d2d, NEG_INF)
    b_vec = jnp.where(valid, shift_lo(mat_c) + m2d_j, NEG_INF)
    s = 1
    while s < W:
        c_s = jnp.where(lane >= s, pltpu.roll(c_vec, jnp.int32(s), 1), 0.0)
        b_s = jnp.where(lane >= s, pltpu.roll(b_vec, jnp.int32(s), 1), NEG_INF)
        b_vec = lse(b_s + c_vec, b_vec)
        c_vec = c_s + c_vec
        s *= 2
    del_c = jnp.where(valid, b_vec, NEG_INF)

    end_row = jf == y_len
    end_ok = valid & end_row if local else (valid & end_row & (idx == x_len - 1.0))
    out_ref[:] = lse(out_ref[:], jnp.where(end_ok, mat_c + m2e_j, NEG_INF))

    mat_ref[:] = mat_c
    ins_ref[:] = ins_c
    del_ref[:] = del_c
    mrow_ref[0] = mat_c
    irow_ref[0] = ins_c
    drow_ref[0] = del_c


def _bwd_kernel(
    keys_ref,  # [1, NUM_KEYS, B] for row j (reversed stream)
    emis_ref, insv_ref, ik_ref, member_ref, xsl_ref, meta_ref,
    doff_ref, sold_ref,
    wrow_ref,  # [8, B]: row 0 = pair weight w_b; row 1 = fwd_total (norm)
    fm_cur_ref, fi_cur_ref, fd_cur_ref,  # fwd rows j
    fm_prev_ref, fi_prev_ref, fd_prev_ref,  # fwd rows j-1
    d_emis_ref, d_insv_ref, d_ik_ref, d_sc_ref,  # outputs (accumulated)
    bm_ref, bi_ref, bd_ref, win_ref, menext_ref, ienext_ref,
    *, width: int, n_rows: int, local: bool,
    n_segs: int = MAX_SEGS, n_ik: int = 0,
):
    g = pl.program_id(0)
    j = n_rows - g  # row index, Ly..1
    # dynamic gap transitions from meta rows 3-6 (see _fwd_kernel)
    d2d = meta_ref[3, :][:, None]
    d2m = meta_ref[4, :][:, None]
    i2i = meta_ref[5, :][:, None]
    i2m = meta_ref[6, :][:, None]
    B = member_ref.shape[0]
    W = width
    lse = _lse2_fast

    @pl.when(g == 0)
    def _init():
        neg = jnp.full((B, W), NEG_INF, jnp.float32)
        bm_ref[:] = neg
        bi_ref[:] = neg
        bd_ref[:] = neg
        win_ref[:] = xsl_ref[:]
        menext_ref[:] = jnp.zeros((B, W), jnp.float32)
        ienext_ref[:] = jnp.zeros((B, W), jnp.float32)
        d_emis_ref[:] = jnp.zeros_like(d_emis_ref)
        d_insv_ref[:] = jnp.zeros_like(d_insv_ref)
        d_ik_ref[:] = jnp.zeros_like(d_ik_ref)
        d_sc_ref[:] = jnp.zeros_like(d_sc_ref)

    @pl.when(g > 0)
    def _advance():
        # each segment's window slides one lane toward lower t: new
        # element at the segment's FIRST lane (sold_ref marks them)
        win = pltpu.roll(win_ref[:], jnp.int32(1), 1)
        slot = sold_ref[:]
        for k in range(n_segs):
            oldcol = keys_ref[0, K_OLDTOK0 + k, :][:, None].astype(jnp.float32)
            win = jnp.where(slot == float(k), oldcol, win)
        win_ref[:] = win

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    x_len = meta_ref[1, :][:, None]
    y_len = meta_ref[2, :][:, None]
    jf = j.astype(jnp.float32)
    idx = doff_ref[:] + (jf - 1.0)
    valid = (member_ref[:] > 0.5) & (idx >= 0.0) & (idx < x_len) & (jf <= y_len)

    (emit_cols, ins_emit, tr_prev, tr_cur, oh_k, oh_q, oh_t, oh_prev,
     oh_cur) = (
        _emission_lookup(keys_ref, emis_ref, insv_ref, ik_ref, B, n_ik)
    )
    # back recursion uses row-j transitions (ik_cur context)
    if n_ik == 1:
        m2m_c = ik_ref[0, 0]
        m2i_c = ik_ref[0, 1]
        m2d_c = ik_ref[0, 2]
        m2e_c = ik_ref[0, 3]
        m2m_p, m2i_p = m2m_c, m2i_c
    else:
        m2m_c = tr_cur[:, 0][:, None]
        m2i_c = tr_cur[:, 1][:, None]
        m2d_c = tr_cur[:, 2][:, None]
        m2e_c = tr_cur[:, 3][:, None]
        # count weights use the row's own (prev-context) transitions
        m2m_p = tr_prev[:, 0][:, None]
        m2i_p = tr_prev[:, 1][:, None]

    me_cur = _select_emit(win_ref[:], emit_cols, B, W)
    ie_cur = ins_emit

    def shift_hi(v):
        return jnp.where(lane == W - 1, NEG_INF, pltpu.roll(v, jnp.int32(W - 1), 1))

    def shift_lo(v):
        return jnp.where(lane == 0, NEG_INF, pltpu.roll(v, jnp.int32(1), 1))

    bm_next = bm_ref[:]
    bi_next = bi_ref[:]
    bd_next = bd_ref[:]
    from_match = menext_ref[:] + bm_next

    # back del: reverse in-row recurrence
    b_vec = jnp.where(valid, d2m + from_match, NEG_INF)
    c_vec = jnp.where(valid, d2d, NEG_INF)
    # reverse scan: mirror lanes
    rlane = (W - 1) - lane
    s = 1
    while s < W:
        c_s = jnp.where(rlane >= s, pltpu.roll(c_vec, jnp.int32(W - s), 1), 0.0)
        b_s = jnp.where(rlane >= s, pltpu.roll(b_vec, jnp.int32(W - s), 1), NEG_INF)
        b_vec = lse(b_s + c_vec, b_vec)
        c_vec = c_s + c_vec
        s *= 2
    bd_cur = jnp.where(valid, b_vec, NEG_INF)

    end_row = jf == y_len
    end_ok = valid & end_row if local else (valid & end_row & (idx == x_len - 1.0))
    bm_cur = lse(
        lse(jnp.where(end_ok, m2e_c, NEG_INF), m2m_c + from_match),
        lse(
            m2i_c + _ie_next_col(ienext_ref) + shift_lo(bi_next),
            m2d_c + shift_hi(bd_cur),
        ),
    )
    bm_cur = jnp.where(valid, bm_cur, NEG_INF)

    bi_cur = lse(i2m + from_match, i2i + _ie_next_col(ienext_ref) + shift_lo(bi_next))
    bi_cur = jnp.where(valid, bi_cur, NEG_INF)

    # ---- posterior counts ----
    w_pair = wrow_ref[0, :][:, None]  # [B, 1]
    f_norm = wrow_ref[1, :][:, None]

    fm_cur = fm_cur_ref[0]
    fi_cur = fi_cur_ref[0]
    fd_cur = fd_cur_ref[0]
    is_first = jf == 1.0
    neg = jnp.full((B, W), NEG_INF, jnp.float32)
    fm_prev = jnp.where(is_first, neg, fm_prev_ref[0])
    fi_prev = jnp.where(is_first, neg, fi_prev_ref[0])
    fd_prev = jnp.where(is_first, neg, fd_prev_ref[0])

    def post(logw):
        return jnp.exp(jnp.minimum(logw - f_norm, 40.0))

    w_m2m = post(fm_prev + m2m_p + me_cur + bm_cur)
    w_d2m = post(fd_prev + d2m + me_cur + bm_cur)
    w_i2m = post(fi_prev + i2m + me_cur + bm_cur)
    start_ok = (
        jnp.broadcast_to(is_first, (B, W)) if local else (is_first & (idx == 0.0))
    )
    # shared with the back-score contribution below (sb): one exp
    post_s2m = post(me_cur + bm_cur)
    w_s2m = jnp.where(start_ok, post_s2m, 0.0)
    mc = w_m2m + w_d2m + w_i2m + w_s2m

    w_m2i = post(shift_hi(fm_prev) + m2i_p + ie_cur + bi_cur)
    w_i2i = post(shift_hi(fi_prev) + i2i + ie_cur + bi_cur)

    # per-row renormalisation: every read base is emitted exactly once, so
    # each valid row's match+insert posterior mass is exactly 1 in exact
    # arithmetic.  Dividing by the computed row sum cancels the row-level
    # f32 forward/backward drift (which otherwise inflates counts through
    # exp()) and folds in the pair weight.
    row_sum = jnp.sum(mc + w_m2i + w_i2i, axis=1, keepdims=True)  # [B, 1]
    factor = jnp.where(row_sum > 1e-30, w_pair / row_sum, 0.0)
    mc = mc * factor
    w_m2m = w_m2m * factor
    w_d2m = w_d2m * factor
    w_i2m = w_i2m * factor
    w_m2i = w_m2i * factor
    w_i2i = w_i2i * factor
    ic_row = jnp.sum(w_m2i + w_i2i, axis=1)  # [B]

    w_m2d = post(shift_lo(fm_cur) + m2d_c + bd_cur) * factor
    w_d2d = post(shift_lo(fd_cur) + d2d + bd_cur) * factor
    w_m2e = jnp.where(end_ok, post(fm_cur + m2e_c), 0.0) * factor

    # per-symbol match-count reduction over the window, scattered into the
    # split-layout table [Km, 4*QP] via (kmer one-hot)^T @ (count ⊗ qual
    # one-hot) — the transposed form of the split emission lookup
    tok = win_ref[:]
    mc_sq = jnp.concatenate(
        [
            jnp.sum(jnp.where(tok == float(a), mc, 0.0), axis=1)[:, None]
            * oh_q
            for a in range(4)
        ],
        axis=1,
    )  # [B, 4*QP]
    # NOTE: chunked 3-pass accumulation (_acc_dot_chunked) was measured a
    # wash here (0.095 -> 0.105 s/EM-iter @ 8 reads): the [B, 4*QP]
    # chunk-prep VPU cost cancels the saved MXU passes.  HIGHEST keeps
    # the deterministic summation order.
    d_emis_ref[:] += jax.lax.dot_general(oh_k, mc_sq, _B_CONTRACT, **_DOT)
    ic_q = ic_row[:, None] * oh_q  # [B, QP]
    d_insv_ref[:] += jax.lax.dot_general(oh_t, ic_q, _B_CONTRACT, **_DOT)

    t_m2m = jnp.sum(w_m2m, axis=1)
    t_m2i = jnp.sum(w_m2i, axis=1)
    t_m2d = jnp.sum(w_m2d, axis=1)
    t_m2e = jnp.sum(w_m2e, axis=1)
    prev_pack = jnp.stack(
        [t_m2m, t_m2i, jnp.zeros_like(t_m2m), jnp.zeros_like(t_m2m)], axis=1
    )
    cur_pack = jnp.stack(
        [jnp.zeros_like(t_m2m), jnp.zeros_like(t_m2m), t_m2d, t_m2e], axis=1
    )
    prev_pack = jnp.pad(prev_pack, ((0, 0), (0, 4)))
    cur_pack = jnp.pad(cur_pack, ((0, 0), (0, 4)))
    if n_ik == 1:
        # single indel context: both one-hots are the all-ones first
        # column, so the transposed dots collapse to a batch sum into
        # table row 0
        d_ik_ref[0, :] += jnp.sum(prev_pack + cur_pack, axis=0)
    else:
        d_ik_ref[:] += jax.lax.dot_general(
            oh_prev, prev_pack, (((0,), (0,)), ((), ())), **_DOT
        ) + jax.lax.dot_general(oh_cur, cur_pack, (((0,), (0,)), ((), ())), **_DOT)

    d_sc_ref[0, :] += jnp.sum(w_i2i, axis=1)
    d_sc_ref[1, :] += jnp.sum(w_i2m, axis=1)
    d_sc_ref[2, :] += jnp.sum(w_d2d, axis=1)
    d_sc_ref[3, :] += jnp.sum(w_d2m, axis=1)
    # back score contribution (j == 1)
    sb = jnp.where(valid & start_ok, post_s2m, 0.0)
    d_sc_ref[4, :] += jnp.sum(sb, axis=1)

    bm_ref[:] = bm_cur
    bi_ref[:] = bi_cur
    bd_ref[:] = bd_cur
    menext_ref[:] = me_cur
    ienext_ref[:] = jnp.broadcast_to(ie_cur, (B, W))


def _ie_next_col(ienext_ref):
    return ienext_ref[:, 0:1]


# ---------------------------------------------------------------------------
# host wrappers


@functools.partial(jax.jit, static_argnames=("width", "b_pad"))
def _prepare_bwd_extras(batch: dict, width: int, b_pad: int):
    """Per-segment K_OLDTOK channels and the last-row window for the
    backward sweep (segment-aware: each packed segment's window re-enters
    tokens at its own first lane)."""
    x_tok = batch["x_tok"]
    x_len = batch["x_len"]
    B = x_tok.shape[0]
    Ly = batch["y_tok"].shape[1]
    W, Bp = width, b_pad
    seg_d_lo, seg_start, seg_width = _segment_arrays(batch, W)
    _, _, _, doff_i = _lane_tables(seg_d_lo, seg_start, seg_width, W, B, Bp)
    from .pallas_v2 import (
        _cyclic_lanes,
        _cyclic_rows,
        _roll_lanes_per_row,
        _roll_rows_per_column,
    )

    # oldtok for backward row j: segment k's window at row j starts at
    # t = seg_d_lo + j - 1, so sliding from row j+1 down to j inserts
    # t = seg_d_lo + j - 1 at the segment's first lane (0-based row r:
    # t = seg_d_lo + r).  Banded indices -> per-column variable rolls.
    rows = jnp.arange(Ly, dtype=jnp.int32)[:, None]
    x_tok_t = x_tok.astype(jnp.int32).T  # [Lx, B]
    Lx = x_tok_t.shape[0]
    n_segs = seg_d_lo.shape[1]
    oldtoks = []
    for k in range(n_segs):
        idx_old = seg_d_lo[None, :, k] + rows
        ok = (
            (seg_width[None, :, k] > 0)
            & (idx_old >= 0)
            & (idx_old < x_len[None, :])
        )
        rolled = _cyclic_rows(
            _roll_rows_per_column(x_tok_t, seg_d_lo[:, k]), Ly
        )
        oldtok = jnp.where(ok, rolled, -1)
        oldtoks.append(
            jnp.pad(oldtok.astype(jnp.int32), ((0, 0), (0, Bp - B)))
        )

    # window for the last row Ly: token at each lane's diagonal + Ly - 1
    tL = doff_i + (Ly - 1)
    okL = (tL >= 0) & (tL < x_len[:, None])
    x_tok_l = x_tok.astype(jnp.int32)
    xsl_b = jnp.full((B, W), -1, jnp.int32)
    lane_w = jnp.arange(W, dtype=jnp.int32)[None, :]
    for k in range(n_segs):
        start = seg_start[:, k][:, None]
        wk = seg_width[:, k][:, None]
        in_seg = (wk > 0) & (lane_w >= start) & (lane_w < start + wk)
        rolled = _cyclic_lanes(_roll_lanes_per_row(
            x_tok_l, seg_d_lo[:, k] - seg_start[:, k] + (Ly - 1)
        ), W)
        xsl_b = jnp.where(in_seg, rolled, xsl_b)
    xsl_b = jnp.where(okL, xsl_b, -1)
    xsl = jnp.full((Bp, W), -1.0, jnp.float32).at[:B].set(xsl_b.astype(jnp.float32))
    return oldtoks, xsl


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "b_pad", "n_rows", "local", "interpret", "n_segs", "n_ik",
    ),
)
def _fwd_store(keys, emis, insv, ik, member, xs0, meta, doff, snew,
               width, b_pad, n_rows, local, interpret=False,
               n_segs=MAX_SEGS, n_ik=0):
    kernel = functools.partial(
        _fwd_kernel, width=width, local=local, n_segs=n_segs, n_ik=n_ik
    )
    resident = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    row_out = pl.BlockSpec(
        (1, b_pad, width), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    out, mrows, irows, drows = pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((1, NUM_KEYS, b_pad), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            resident(emis.shape),
            resident(insv.shape),
            resident(ik.shape),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident(meta.shape),
            resident((b_pad, width)),
            resident((b_pad, width)),
        ],
        out_specs=(resident((b_pad, width)), row_out, row_out, row_out),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, width), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, b_pad, width), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, b_pad, width), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, b_pad, width), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
    )(keys, emis, insv, ik, member, xs0, meta, doff, snew)
    return out, mrows, irows, drows


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "b_pad", "n_rows", "local", "interpret", "n_segs", "n_ik",
    ),
)
def _bwd_counts(keys, emis, insv, ik, member, xsl, meta, doff, sold, wrow,
                mrows, irows, drows,
                width, b_pad, n_rows, local, interpret=False,
                n_segs=MAX_SEGS, n_ik=0):
    kernel = functools.partial(
        _bwd_kernel, width=width, n_rows=n_rows, local=local,
        n_segs=n_segs, n_ik=n_ik,
    )
    resident = lambda shape: pl.BlockSpec(
        shape, lambda g: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    # backward step g handles row j = n_rows - g: fwd row block (j-1 zero-
    # based) = n_rows - 1 - g; prev row block = max(j-2, 0)
    cur_spec = pl.BlockSpec(
        (1, b_pad, width), lambda g: (n_rows - 1 - g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    prev_spec = pl.BlockSpec(
        (1, b_pad, width),
        lambda g: (jnp.maximum(n_rows - 2 - g, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    keys_spec = pl.BlockSpec(
        (1, NUM_KEYS, b_pad), lambda g: (n_rows - 1 - g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    d_emis, d_insv, d_ik, d_sc = pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[
            keys_spec,
            resident(emis.shape),
            resident(insv.shape),
            resident(ik.shape),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident(meta.shape),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident(wrow.shape),
            cur_spec, cur_spec, cur_spec,
            prev_spec, prev_spec, prev_spec,
        ],
        out_specs=(
            resident(emis.shape),
            resident(insv.shape),
            resident(ik.shape),
            resident(wrow.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(emis.shape, jnp.float32),
            jax.ShapeDtypeStruct(insv.shape, jnp.float32),
            jax.ShapeDtypeStruct(ik.shape, jnp.float32),
            jax.ShapeDtypeStruct(wrow.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
    )(keys, emis, insv, ik, member, xsl, meta, doff, sold, wrow,
      mrows, irows, drows, mrows, irows, drows)
    return d_emis, d_insv, d_ik, d_sc


def _estep_fused_core(emis, insv, ik, batch, gid, null_ll, trans4,
                      local, Km, Ki, interpret=False):
    """One dispatch for a whole E-step batch: input prep, forward fill
    (stored rows), read-level posterior weights from the forward scores
    and each read's null log-likelihood, and the weighted backward-counts
    sweep.  The batch may mix pairs from SEVERAL reads: gid[b] gives the
    read group of entry b, null_ll[g] each group's null log-likelihood;
    weights are exp(fwd_b - y_ll[gid_b]) with
    y_ll[g] = lse(null_ll[g], fwd of group g).  Counts come back summed
    over the whole batch (the E-step epoch total is a plain sum over
    reads, qmodel.cpp:2416-2418)."""
    Q = QUAL_SCORE_RANGE
    member = batch["member"]
    B, W0 = member.shape
    Ly = int(batch["y_tok"].shape[1])
    W = _round_up(max(int(W0), 128), 128)
    Bp = _round_up(int(B), 8)
    n_segs = int(batch["seg_d_lo"].shape[1]) if "seg_d_lo" in batch else 1
    keys, xs0, meta, member_f, doff, snew, sold = _prepare_device(
        {}, batch, W, Bp
    )
    meta = meta.at[3:7, :].set(
        jnp.broadcast_to(trans4.astype(jnp.float32)[:, None], (4, Bp))
    )
    oldtoks, xsl = _prepare_bwd_extras(batch, W, Bp)
    for k in range(n_segs):
        keys = keys.at[:, K_OLDTOK0 + k, :].set(oldtoks[k])

    out, mrows, irows, drows = _fwd_store(
        keys, emis, insv, ik, member_f, xs0, meta, doff, snew,
        width=W, b_pad=Bp, n_rows=Ly, local=local,
        interpret=interpret, n_segs=n_segs, n_ik=Ki,
    )
    fwd = jax.nn.logsumexp(out[:B], axis=1)
    fwd = jnp.where(fwd <= NEG_INF / 2, -jnp.inf, fwd)

    # per-read responsibilities: y_ll[g] = lse(null_ll[g], fwd of g)
    G = null_ll.shape[0]
    finite = jnp.isfinite(fwd)
    fwd0 = jnp.where(finite, fwd, -jnp.inf)
    oh = gid[:, None] == jnp.arange(G, dtype=gid.dtype)[None, :]  # [B, G]
    gmax = jnp.max(jnp.where(oh, fwd0[:, None], -jnp.inf), axis=0)
    m = jnp.maximum(gmax, null_ll.astype(jnp.float32))
    gsum = jnp.sum(
        jnp.where(oh, jnp.exp(fwd0[:, None] - m[None, :]), 0.0), axis=0
    )
    y_ll_g = m + jnp.log(gsum + jnp.exp(null_ll.astype(jnp.float32) - m))
    y_ll = jnp.take(y_ll_g, gid)  # [B]
    weights = jnp.where(finite, jnp.exp(fwd - y_ll), 0.0)

    wrow = jnp.zeros((8, Bp), jnp.float32)
    wrow = wrow.at[0, :B].set(weights)
    wrow = wrow.at[1, :B].set(jnp.where(finite, fwd, 0.0))
    d_emis, d_insv, d_ik, d_sc = _bwd_counts(
        keys, emis, insv, ik, member_f, xsl, meta, doff, sold, wrow,
        mrows, irows, drows,
        width=W, b_pad=Bp, n_rows=Ly, local=local,
        interpret=interpret, n_segs=n_segs, n_ik=Ki,
    )
    # pack EVERYTHING into one f32 vector: a remotely-attached device
    # pays a round trip per fetched array, and the E-step's results are
    # a dozen small arrays — one concatenated fetch instead of twelve
    packed = jnp.concatenate([
        fwd,
        y_ll_g,
        d_emis[:Km].reshape(Km, 4, QP)[:, :, :Q].transpose(1, 0, 2).ravel(),
        d_insv[:4, :Q].ravel(),
        d_ik[:Ki, :4].T.ravel(),
        d_sc[:5, :B].ravel(),
    ])
    return packed


_estep_fused_jit = functools.partial(jax.jit, static_argnames=(
    "local", "Km", "Ki", "interpret"
))(_estep_fused_core)


def estep_fused(tables, v2tab: V2Tables, batch: dict, null_ll: float,
                local: bool = True, interpret: bool = False):
    """Single-read E-step entry: returns (fwd [B], y_ll [1], counts).

    null_ll is the read's null-model log likelihood (-inf when the null
    model is disallowed, t/quaff.cpp -force).
    """
    B = int(batch["member"].shape[0])
    return estep_fused_multi(
        tables, v2tab, batch,
        np.zeros(B, np.int32), np.asarray([null_ll], np.float64),
        local=local, interpret=interpret,
    )


# True once this process has dispatched a fused E-step kernel (see
# pallas_v2.KERNEL_WARM — same time-to-first-result gate: the trainer's
# small-workload CPU-engine route is active only while this is False).
KERNEL_WARM = False


def estep_fused_multi(tables, v2tab: V2Tables, batch: dict, gid, null_lls,
                      local: bool = True, interpret: bool = False):
    """Multi-read E-step entry: pairs of several reads in ONE kernel
    dispatch.  gid [B] maps batch entries to read groups; null_lls [G]
    holds each group's null log-likelihood.  Returns
    (fwd [B], y_ll [G], counts summed over the whole batch)."""
    global KERNEL_WARM
    KERNEL_WARM = True
    Km = np.asarray(tables.match_score).shape[1]
    Ki = len(np.asarray(tables.m2m))
    Q = QUAL_SCORE_RANGE
    nl = jnp.asarray(
        np.where(np.isfinite(null_lls), null_lls, -np.inf), jnp.float32
    )
    packed = np.asarray(
        _estep_fused_jit(
            v2tab.emis, v2tab.insv, v2tab.ik, batch,
            jnp.asarray(gid, jnp.int32), nl,
            jnp.asarray(v2tab.trans, jnp.float32),
            local=local, Km=Km, Ki=Ki, interpret=interpret,
        ),
        dtype=np.float64,
    )
    B = int(batch["member"].shape[0])
    G = len(null_lls)
    o = 0
    fwd = packed[o : o + B]; o += B
    y_ll = packed[o : o + G]; o += G
    match = packed[o : o + 4 * Km * Q].reshape(4, Km, Q); o += 4 * Km * Q
    insert = packed[o : o + 4 * Q].reshape(4, Q); o += 4 * Q
    ik4 = packed[o : o + 4 * Ki].reshape(4, Ki); o += 4 * Ki
    sc5 = packed[o : o + 5 * B].reshape(5, B); o += 5 * B
    counts = {
        "match_counts": match,
        "insert_counts": insert,
        "m2m": ik4[0],
        "m2i": ik4[1],
        "m2d": ik4[2],
        "m2e": ik4[3],
        "i2i": sc5[0],
        "i2m": sc5[1],
        "d2d": sc5[2],
        "d2m": sc5[3],
        "back_start_post": sc5[4],
    }
    return fwd, y_ll, counts


def estep_kernel(tables, v2tab: V2Tables, batch: dict, weights,
                 f_norm, local: bool = True, interpret: bool = False):
    """Run the Pallas E-step for one batch.

    weights: [B] posterior weight per pair (e.g. exp(fwd_b - y_loglike)).
    f_norm: [B] normaliser per pair (each pair's own forward score).
    Returns (fwd_scores [B], counts dict with reference-shaped arrays).
    """
    Q = QUAL_SCORE_RANGE
    member = batch["member"]
    B, W0 = member.shape
    Ly = int(batch["y_tok"].shape[1])
    W = _round_up(max(W0, 128), 128)
    Bp = _round_up(B, 8)
    n_segs = int(batch["seg_d_lo"].shape[1]) if "seg_d_lo" in batch else 1
    keys, xs0, meta, member_f, doff, snew, sold = _prepare_device(
        {}, batch, W, Bp
    )
    meta = meta.at[3:7, :].set(
        jnp.broadcast_to(
            jnp.asarray(v2tab.trans, jnp.float32)[:, None], (4, Bp)
        )
    )
    oldtoks, xsl = _prepare_bwd_extras(batch, W, Bp)
    for k in range(n_segs):
        keys = keys.at[:, K_OLDTOK0 + k, :].set(oldtoks[k])

    out, mrows, irows, drows = _fwd_store(
        keys, v2tab.emis, v2tab.insv, v2tab.ik, member_f, xs0, meta,
        doff, snew,
        width=W, b_pad=Bp, n_rows=Ly, local=local,
        interpret=interpret, n_segs=n_segs, n_ik=int(np.asarray(tables.m2m).shape[0]),
    )
    fwd = jax.nn.logsumexp(out[:B], axis=1)
    fwd = jnp.where(fwd <= NEG_INF / 2, -jnp.inf, fwd)

    wrow = jnp.zeros((8, Bp), jnp.float32)
    wrow = wrow.at[0, :B].set(jnp.asarray(weights, jnp.float32))
    f_norm32 = jnp.asarray(f_norm, jnp.float32)
    wrow = wrow.at[1, :B].set(
        jnp.where(jnp.isfinite(f_norm32), f_norm32, 0.0)
    )
    d_emis, d_insv, d_ik, d_sc = _bwd_counts(
        keys, v2tab.emis, v2tab.insv, v2tab.ik, member_f, xsl, meta,
        doff, sold, wrow,
        mrows, irows, drows,
        width=W, b_pad=Bp, n_rows=Ly, local=local,
        interpret=interpret, n_segs=n_segs, n_ik=int(np.asarray(tables.m2m).shape[0]),
    )
    Km = np.asarray(tables.match_score).shape[1]
    Ki = len(np.asarray(tables.m2m))
    counts = {
        "match_counts": d_emis[:Km]
        .reshape(Km, 4, QP)[:, :, :Q]
        .transpose(1, 0, 2),  # [4, Km, Q]
        "insert_counts": d_insv[:4, :Q],
        "m2m": d_ik[:Ki, 0],
        "m2i": d_ik[:Ki, 1],
        "m2d": d_ik[:Ki, 2],
        "m2e": d_ik[:Ki, 3],
        "i2i": d_sc[0, :B],
        "i2m": d_sc[1, :B],
        "d2d": d_sc[2, :B],
        "d2m": d_sc[3, :B],
        "back_start_post": d_sc[4, :B],
    }
    return fwd, counts
