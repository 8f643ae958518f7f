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
from .pallas_v2 import (
    NEG_INF,
    _cyclic_lanes,
    _roll_lanes_per_row,
    _round_up,
)

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


def _ov_tabs(tables):
    """Small per-(params, strand) device tables for the overlap kernel
    (cached on the tables object; ~25 KB total)."""
    if hasattr(tables, "_ov_tabs_cache"):
        return tables._ov_tabs_cache
    Q = QUAL_SCORE_RANGE
    base = tables.base_tables
    msx = np.asarray(base.match_score, np.float32)  # [4, Km, Q]
    msx_n = np.asarray(base.match_score_noq, np.float32)  # [4, Km]
    y_map = np.asarray(tables.y_symbol_map)
    Km = msx.shape[1]
    tabs = {
        # key = km * Q + q -> value per marginalised ref symbol r
        "msx2": jnp.asarray(msx.transpose(1, 2, 0).reshape(Km * Q, 4)),
        "msxn2": jnp.asarray(msx_n.T.copy()),  # [Km, 4]
        "msy2": jnp.asarray(
            msx[y_map].transpose(1, 2, 0).reshape(Km * Q, 4)
        ),
        "msyn2": jnp.asarray(msx_n[y_map].T.copy()),
        "ins2": jnp.asarray(
            np.asarray(tables.insert_score, np.float32).reshape(-1)
        ),  # [4*Q], key = tok * Q + q
        "insn2": jnp.asarray(
            np.asarray(tables.insert_score_noq, np.float32)
        ),
        "log_rb": jnp.asarray(np.asarray(tables.log_ref_base, np.float32)),
    }
    tables._ov_tabs_cache = tabs
    return tabs


@functools.partial(jax.jit, static_argnames=("width", "b_pad", "n_rows"))
def _ov_prepare_device(tabs: dict, batch: dict, width: int, b_pad: int,
                       n_rows=None):
    """Device-side overlap input prep from the already-transferred narrow
    int batch arrays: banded x-side views via per-pair variable lane
    rolls, emission/insert resolution via small-table gathers.  Replaces
    the previous host-side assembly, whose [Ly, 16, B] f32 stream cost
    ~54 MB of host->device transfer per batch on a tunnelled TPU.

    Sequence-bank batches ("x_row" present) carry each distinct
    (sequence, strand) ONCE in bank_* arrays plus per-pair row indices —
    all-vs-all overlap would otherwise re-transfer every read per pair."""
    Q = QUAL_SCORE_RANGE
    if "x_row" in batch:
        bt = batch["bank_tok"].astype(jnp.int32)
        bm = batch["bank_mk"].astype(jnp.int32)
        bqv = batch["bank_q"].astype(jnp.int32)
        bh = batch["bank_hq"]
        xr = batch["x_row"]
        yr = batch["y_row"]
        x_tok = jnp.take(bt, xr, axis=0)
        x_mk = jnp.take(bm, xr, axis=0)
        x_q = jnp.take(bqv, xr, axis=0)
        x_hq = jnp.take(bh, xr)
        y_mk = jnp.take(bm, yr, axis=0)[:, :n_rows]
        y_tok = jnp.take(bt, yr, axis=0)[:, :n_rows]
        y_q = jnp.take(bqv, yr, axis=0)[:, :n_rows]
        y_hq = jnp.take(bh, yr)
    else:
        x_tok = batch["x_tok"].astype(jnp.int32)
        x_mk = batch["x_match_kmer"].astype(jnp.int32)
        x_q = batch["x_qual"].astype(jnp.int32)
        x_hq = batch["x_has_qual"]
        y_mk = batch["y_match_kmer"].astype(jnp.int32)
        y_tok = batch["y_tok"].astype(jnp.int32)
        y_q = batch["y_qual"].astype(jnp.int32)
        y_hq = batch["y_has_qual"]
    x_len = batch["x_len"].astype(jnp.int32)
    y_len = batch["y_len"].astype(jnp.int32)
    d_lo = batch["d_lo"].astype(jnp.int32)
    member = batch["member"]

    B, W0 = member.shape
    Ly = y_mk.shape[1]
    W, Bp = width, b_pad
    T = Ly + W
    KmQ = tabs["msx2"].shape[0]
    Km = tabs["msxn2"].shape[0]

    # banded x views (x value at band coordinate t = x[d_lo + t])
    def band(v):
        return _cyclic_lanes(_roll_lanes_per_row(v, d_lo), T)

    idx = d_lo[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    ok = (idx >= 0) & (idx < x_len[:, None])
    xkm_b = band(x_mk)
    xq_b = band(x_q)
    xtok_b = band(x_tok)

    key_x = jnp.clip(xkm_b * Q + xq_b, 0, KmQ - 1)
    vals_q4 = jnp.take(tabs["msx2"], key_x, axis=0)  # [B, T, 4]
    vals_n4 = jnp.take(tabs["msxn2"], jnp.clip(xkm_b, 0, Km - 1), axis=0)
    vals4 = (
        jnp.where(x_hq[:, None, None], vals_q4, vals_n4)
        + tabs["log_rb"][None, None, :]
    )
    a_bands = [
        jnp.where(ok, vals4[..., r], NEG_INF) for r in range(ALPHABET_SIZE)
    ]
    c_q = jnp.take(
        tabs["ins2"], jnp.clip(xtok_b * Q + xq_b, 0, 4 * Q - 1)
    )
    c_n = jnp.take(tabs["insn2"], jnp.clip(xtok_b, 0, 3))
    c_band = jnp.where(ok, jnp.where(x_hq[:, None], c_q, c_n), 0.0)

    # y-side per-row values (strand fold baked into msy2/msyn2)
    key_y = jnp.clip(y_mk * Q + y_q, 0, KmQ - 1)
    msy4 = jnp.where(
        y_hq[:, None, None],
        jnp.take(tabs["msy2"], key_y, axis=0),
        jnp.take(tabs["msyn2"], jnp.clip(y_mk, 0, Km - 1), axis=0),
    )  # [B, Ly, 4]
    insy = jnp.where(
        y_hq[:, None],
        jnp.take(tabs["ins2"], jnp.clip(y_tok * Q + y_q, 0, 4 * Q - 1)),
        jnp.take(tabs["insn2"], jnp.clip(y_tok, 0, 3)),
    )

    def padB_rows(a):  # [B, Ly] -> [Ly, Bp]
        return jnp.pad(a.T.astype(jnp.float32), ((0, 0), (0, Bp - B)))

    channels = [padB_rows(msy4[..., r]) for r in range(4)]
    channels.append(padB_rows(insy))
    for k in range(4):
        channels.append(padB_rows(a_bands[k][:, W - 1 : W - 1 + Ly]))
    channels.append(padB_rows(c_band[:, W - 1 : W - 1 + Ly]))
    zeros = jnp.zeros((Ly, Bp), jnp.float32)
    rows = jnp.stack(channels + [zeros] * (NUM_CH - len(channels)), axis=1)

    def padW(a, fill):
        return jnp.full((Bp, W), fill, jnp.float32).at[:B].set(
            a[:, :W].astype(jnp.float32)
        )

    a0, a1, a2, a3 = (padW(a_bands[k], NEG_INF) for k in range(4))
    c0 = padW(c_band, 0.0)
    member_f = jnp.zeros((Bp, W), jnp.float32).at[:B, :W0].set(
        member.astype(jnp.float32)
    )
    meta = jnp.zeros((8, Bp), jnp.float32)
    meta = meta.at[0, :B].set(d_lo.astype(jnp.float32))
    meta = meta.at[1, :B].set(x_len.astype(jnp.float32))
    meta = meta.at[2, :B].set(y_len.astype(jnp.float32))
    return rows, member_f, a0, a1, a2, a3, c0, meta


def overlap_scores_kernel(tables, batch, interpret: bool = False,
                          n_rows: int = None):
    """Overlap end scores [B] for an overlap batch (OverlapBatch.device()
    dict, or a sequence-bank dict with x_row/y_row indices — then n_rows
    gives the padded read length).  Requires gap order 0.  Returns
    end + x/y insert scores, i.e. the same quantity as
    dp.overlap.overlap_fill's 'score'."""
    if tables.indel_kmer_len != 0:
        raise ValueError("overlap kernel supports gap order 0 only")
    member = np.asarray(batch["member"])
    B, W0 = member.shape
    Ly = (
        int(n_rows) if n_rows is not None
        else int(np.asarray(batch["y_match_kmer"]).shape[1])
    )
    W = _round_up(max(W0, 128), 128)
    Bp = _round_up(B, 8)

    rows, member_f, a0, a1, a2, a3, c0, meta = _ov_prepare_device(
        _ov_tabs(tables), batch, W, Bp,
        n_rows=Ly if "x_row" in batch else None,
    )

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
        rows, member_f, a0, a1, a2, a3, c0, meta,
        width=W, b_pad=Bp, n_rows=Ly, trans=trans, interpret=interpret,
    )
    end = jnp.max(out[:B], axis=1)
    end = jnp.where(end <= NEG_INF / 2, -jnp.inf, end)
    return end + jnp.asarray(batch["x_insert_score"], jnp.float32) + jnp.asarray(
        batch["y_insert_score"], jnp.float32
    )
