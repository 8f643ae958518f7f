"""Pallas overlap-Viterbi kernel (read-vs-read, order-0 gap contexts).

The overlap pair emission (dp/overlap.py) is a [Km, Km, Q, Q] table —
too irregular to gather per lane in a TPU kernel.  Instead the kernel
recomputes it from its definition, which factorises over the marginalised
reference symbol r (qoverlap.cpp:62-70):

  emit[b,w] = lse_r( logRef[r] + msX[r](i) + msY[r'](j) ) - insX(i) - insY(j)

msX[r](i) (the x-side match score given ref symbol r) and insX(i) depend
only on the x position, so they live in five rolling [B, W] windows
advanced one lane per row (like v2's token window); msY[r'](j) and
insY(j) are per-row scalars resolved with one-hot MXU dots against the
y-side tables (with the strand complement folded into the table for
reverse-strand pairs).  Gap transitions are scalars at the default gap
order 0 (higher orders fall back to the XLA fill).

The mixed max/log-sum-exp delete recursion
  del[w] = max(lse(del[w-1]+d2d, ins[w-1]+d2i), mat[w-1]+m2d)
is an associative scan over affine-max maps carried as (c, k, b) triples
(see dp/overlap._mixed_recurrence) — here unrolled as a lane-shift
Hillis-Steele scan.

This is the scores-only fast path for all-vs-all overlap ranking; exact
output text still comes from the XLA fill + truncated-lse tables (the
kernel's exact-lse emission differs from the golden tables at ~1e-5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import ALPHABET_SIZE, QUAL_SCORE_RANGE
from .pallas_v2 import NEG_INF, _round_up

# streamed per-row channels (f32)
C_MSY0 = 0  # ..3: y-side match score given ref symbol r (strand-folded)
C_INSY = 4  # y-side insert emission
C_NEWA0 = 5  # ..8: new column for x-side windows msX[r]
C_NEWC = 9  # new column for x-side insert window
C_PAD = 10
NUM_CH = 16


def _ov_kernel(
    rows_ref,  # [1, NUM_CH, B] f32 streamed
    member_ref,  # [B, W]
    a0_ref, a1_ref, a2_ref, a3_ref, c0_ref,  # initial windows [B, W]
    meta_ref,  # [8, B]: d_lo, x_len, y_len
    out_ref,  # [B, W] end accumulator
    mat_ref, ins_ref, del_ref,
    wa0_ref, wa1_ref, wa2_ref, wa3_ref, wc_ref,
    *,
    width: int,
    trans: Tuple[float, ...],
):
    j0 = pl.program_id(0)
    (m2m_t, m2i_t, m2d_t, i2m_e, i2i_e, i2d_e, d2m_e, d2i_e, d2d_e) = trans
    B = member_ref.shape[0]
    W = width
    lse = jnp.logaddexp

    wins = (wa0_ref, wa1_ref, wa2_ref, wa3_ref, wc_ref)
    inits = (a0_ref, a1_ref, a2_ref, a3_ref, c0_ref)

    @pl.when(j0 == 0)
    def _init():
        neg = jnp.full((B, W), NEG_INF, jnp.float32)
        mat_ref[:] = neg
        ins_ref[:] = neg
        del_ref[:] = neg
        out_ref[:] = neg
        for w_ref, i_ref in zip(wins, inits):
            w_ref[:] = i_ref[:]

    @pl.when(j0 > 0)
    def _advance():
        lane_ = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        for k, w_ref in enumerate(wins):
            newcol = rows_ref[0, C_NEWA0 + k, :][:, None]
            w_ref[:] = jnp.where(
                lane_ == W - 1, newcol, pltpu.roll(w_ref[:], jnp.int32(W - 1), 1)
            )

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    d_lo = meta_ref[0, :][:, None]
    x_len = meta_ref[1, :][:, None]
    y_len = meta_ref[2, :][:, None]
    jf = (j0 + 1).astype(jnp.float32)
    idx = d_lo + (jf - 1.0) + lane.astype(jnp.float32)
    valid = (member_ref[:] > 0.5) & (idx >= 0.0) & (idx < x_len) & (jf <= y_len)

    # emission: lse over the 4 marginalised ref symbols
    msy = [rows_ref[0, C_MSY0 + r, :][:, None] for r in range(4)]
    acc = wa0_ref[:] + msy[0]
    acc = lse(acc, wa1_ref[:] + msy[1])
    acc = lse(acc, wa2_ref[:] + msy[2])
    acc = lse(acc, wa3_ref[:] + msy[3])
    emit = acc - wc_ref[:] - rows_ref[0, C_INSY, :][:, None]

    mat_p = mat_ref[:]
    ins_p = ins_ref[:]
    del_p = del_ref[:]

    mat_c = jnp.maximum(
        jnp.maximum(mat_p + m2m_t, del_p + d2m_e), ins_p + i2m_e
    )
    start_ok = (jf == 1.0) | (idx == 0.0)
    mat_c = jnp.maximum(mat_c, jnp.where(start_ok, 0.0, NEG_INF))
    mat_c = jnp.where(valid, mat_c + emit, NEG_INF)

    def shift_hi(v):
        return jnp.where(lane == W - 1, NEG_INF, pltpu.roll(v, jnp.int32(W - 1), 1))

    def shift_lo(v):
        return jnp.where(lane == 0, NEG_INF, pltpu.roll(v, jnp.int32(1), 1))

    ins_c = jnp.maximum(
        lse(shift_hi(ins_p) + i2i_e, shift_hi(del_p) + d2i_e),
        shift_hi(mat_p) + m2i_t,
    )
    ins_c = jnp.where(valid, ins_c, NEG_INF)

    # mixed-semiring in-row scan: triples (c, k, b)
    c_vec = jnp.where(valid, d2d_e, NEG_INF)
    k_vec = jnp.where(valid, shift_lo(ins_c) + d2i_e, NEG_INF)
    b_vec = jnp.where(valid, shift_lo(mat_c) + m2d_t, NEG_INF)
    s = 1
    while s < W:
        mask = lane >= s
        c_s = jnp.where(mask, pltpu.roll(c_vec, jnp.int32(s), 1), 0.0)
        k_s = jnp.where(mask, pltpu.roll(k_vec, jnp.int32(s), 1), NEG_INF)
        b_s = jnp.where(mask, pltpu.roll(b_vec, jnp.int32(s), 1), NEG_INF)
        # (c_s,k_s,b_s) applied first, then (c,k,b)
        b_vec = jnp.maximum(lse(b_s + c_vec, k_vec), b_vec)
        k_vec = lse(k_s + c_vec, k_vec)
        c_vec = c_s + c_vec
        s *= 2
    del_c = jnp.where(valid, jnp.maximum(k_vec, b_vec), NEG_INF)

    end_ok = valid & ((jf == y_len) | (idx == x_len - 1.0))
    out_ref[:] = jnp.maximum(out_ref[:], jnp.where(end_ok, mat_c, NEG_INF))

    mat_ref[:] = mat_c
    ins_ref[:] = ins_c
    del_ref[:] = del_c


@functools.partial(
    jax.jit,
    static_argnames=("width", "b_pad", "n_rows", "trans", "interpret"),
)
def _ov_fill(rows, member, a0, a1, a2, a3, c0, meta,
             width, b_pad, n_rows, trans, interpret=False):
    kernel = functools.partial(_ov_kernel, width=width, trans=trans)
    resident = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((1, NUM_CH, b_pad), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident((b_pad, width)),
            resident(meta.shape),
        ],
        out_specs=resident((b_pad, width)),
        out_shape=jax.ShapeDtypeStruct((b_pad, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, width), jnp.float32)] * 8,
        interpret=interpret,
    )(rows, member, a0, a1, a2, a3, c0, meta)
    return out


def overlap_scores_kernel(tables, batch, interpret: bool = False):
    """Overlap end scores [B] for an overlap batch (OverlapBatch.device()
    dict).  Requires gap order 0.  Returns end + x/y insert scores, i.e.
    the same quantity as dp.overlap.overlap_fill's 'score'."""
    if tables.indel_kmer_len != 0:
        raise ValueError("overlap kernel supports gap order 0 only")
    Q = QUAL_SCORE_RANGE

    x_tok = np.asarray(batch["x_tok"])
    x_len = np.asarray(batch["x_len"])
    x_mk = np.asarray(batch["x_match_kmer"])
    x_q = np.asarray(batch["x_qual"])
    x_hq = np.asarray(batch["x_has_qual"])
    y_mk = np.asarray(batch["y_match_kmer"])
    y_tok = np.asarray(batch["y_tok"])
    y_q = np.asarray(batch["y_qual"])
    y_hq = np.asarray(batch["y_has_qual"])
    y_len = np.asarray(batch["y_len"])
    d_lo = np.asarray(batch["d_lo"])
    member = np.asarray(batch["member"])

    B, W0 = member.shape
    Ly = y_mk.shape[1]
    W = _round_up(max(W0, 128), 128)
    Bp = _round_up(B, 8)

    # x-side per-position values in band coordinates:
    # msX[r](t) = log refBase[r] + match score given ref symbol r, folded
    # into the x side; tables is an OverlapScoreTables carrying the base
    # per-symbol ScoreTables
    base = tables.base_tables
    msx = np.asarray(base.match_score, np.float32)  # [4, Km, Q]
    msx_n = np.asarray(base.match_score_noq, np.float32)
    ins_t = np.asarray(tables.insert_score, np.float32)
    ins_n = np.asarray(tables.insert_score_noq, np.float32)
    log_rb = np.asarray(tables.log_ref_base, np.float32)

    t = np.arange(Ly + W)
    idx = d_lo[:, None] + t[None, :]  # [B, Ly+W]
    ok = (idx >= 0) & (idx < x_len[:, None])
    ci = np.clip(idx, 0, x_mk.shape[1] - 1)
    bix = np.arange(B)[:, None]
    xkm_b = x_mk[bix, ci]
    xq_b = x_q[bix, ci]
    xtok_b = x_tok[bix, ci]
    a_bands = []
    for r in range(ALPHABET_SIZE):
        vals_q = msx[r, xkm_b, xq_b]
        vals_n = msx_n[r, xkm_b]
        vals = np.where(x_hq[:, None], vals_q, vals_n) + log_rb[r]
        a_bands.append(np.where(ok, vals, NEG_INF).astype(np.float32))
    c_q = ins_t[xtok_b, xq_b]
    c_n = ins_n[xtok_b]
    c_band = np.where(ok, np.where(x_hq[:, None], c_q, c_n), 0.0).astype(np.float32)

    # y-side per-row values (strand complement already folded into the
    # y arrays by OverlapBatch)
    y_r_map = tables.y_symbol_map  # [4]: ref symbol r -> y-side symbol
    rows = np.zeros((Ly, NUM_CH, Bp), np.float32)
    for r in range(ALPHABET_SIZE):
        rr = y_r_map[r]
        vals_q = msx[rr, y_mk, y_q]
        vals_n = msx_n[rr, y_mk]
        rows[:, C_MSY0 + r, :B] = np.where(y_hq[:, None], vals_q, vals_n).T
    iy_q = ins_t[y_tok, y_q]
    iy_n = ins_n[y_tok]
    rows[:, C_INSY, :B] = np.where(y_hq[:, None], iy_q, iy_n).T
    for k in range(4):
        rows[:, C_NEWA0 + k, :B] = a_bands[k][:, W - 1 : W - 1 + Ly].T
    rows[:, C_NEWC, :B] = c_band[:, W - 1 : W - 1 + Ly].T

    def padW(a, fill):
        out = np.full((Bp, W), fill, np.float32)
        out[:B] = a[:, :W]
        return out

    a0, a1, a2, a3 = (padW(a_bands[k], NEG_INF) for k in range(4))
    c0 = padW(c_band, 0.0)
    member_f = np.zeros((Bp, W), np.float32)
    member_f[:B, :W0] = member.astype(np.float32)
    meta = np.zeros((8, Bp), np.float32)
    meta[0, :B] = d_lo
    meta[1, :B] = x_len
    meta[2, :B] = y_len

    trans = (
        float(tables.m2m[0, 0]),
        float(tables.m2i[0, 0]),
        float(tables.m2d[0, 0]),
        tables.i2m_eff,
        tables.i2i_eff,
        tables.i2d_eff,
        tables.d2m_eff,
        tables.d2i_eff,
        tables.d2d_eff,
    )
    out = _ov_fill(
        jnp.asarray(rows), jnp.asarray(member_f),
        jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(a3),
        jnp.asarray(c0), jnp.asarray(meta),
        width=W, b_pad=Bp, n_rows=Ly, trans=trans, interpret=interpret,
    )
    end = jnp.max(out[:B], axis=1)
    end = jnp.where(end <= NEG_INF / 2, -jnp.inf, end)
    return end + jnp.asarray(batch["x_insert_score"], jnp.float32) + jnp.asarray(
        batch["y_insert_score"], jnp.float32
    )
