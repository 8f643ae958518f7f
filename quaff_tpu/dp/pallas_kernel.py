"""Pallas TPU kernel: banded pair-HMM fill at VMEM speed.

The XLA scan in dp/engine.py dispatches one fused op per read position —
~6600 sequential steps of tiny [B, W] work, which is launch-latency bound
on TPU.  This kernel moves the whole row loop inside a single Pallas
program: the three state vectors live in VMEM scratch across grid steps,
per-row constants stream in as [rows, channels, B] blocks through the
automatic double-buffered pipeline, and the x-sequence context advances as
a rolling one-lane shift of a resident window — so the inner loop is pure
VPU work with no gathers and no HBM round-trips for state.

Key re-mappings from the reference recursion (qmodel.cpp:1343-1560):
  * lane w of the state = diagonal d_lo + w; (i-1,j-1) is the same lane of
    the previous row, (i,j-1) lane w+1, (i-1,j) lane w-1 of this row
  * emission gather  match[xTok[i-1], yKmer[j-1], yQual[j-1]]  becomes a
    4-way select against a rolling token window and 4 streamed per-row
    scalars (one per possible ref symbol)
  * the in-row delete recursion del[w] = op(del[w-1]+d2d, mat[w-1]+m2d)
    is a Hillis-Steele scan over lanes in the (max,+) or (logaddexp,+)
    semiring — log2(W) shifted combines

Scores match the XLA engine bit-for-bit in f32 (same operation order).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)  # Mosaic-friendly -inf stand-in

# streamed per-row channel indices
C_EMIT0 = 0  # ..3: emission value given ref symbol a
C_INS_EMIT = 4
C_M2M = 5  # m2m score for transitions out of row j-1
C_M2I = 6
C_M2D = 7
C_M2E = 8
C_NEWTOK = 9  # token entering the rolling window this row
C_NEWVALID = 10  # whether that token position is inside the x sequence
C_ROWVALID = 11  # j <= y_len
C_ENDROW = 12  # j == y_len
C_STARTROW = 13  # j == 1
C_WEND = 14  # lane index of i == x_len (for -global end)
C_WSTART = 15  # lane index of i == 1 (for -global start)
NUM_CHANNELS = 16


def _row_kernel(
    rows_ref,  # [1, NUM_CHANNELS, B] streamed per-row constants
    member_ref,  # [B, W] f32 0/1 resident
    xs0_ref,  # [B, W] f32 initial token window
    vs0_ref,  # [B, W] f32 initial validity window
    out_ref,  # [B, W] f32: lane-wise end accumulator (output)
    mat_ref,  # scratch [B, W]
    ins_ref,
    del_ref,
    win_ref,  # scratch rolling token window [B, W]
    vwin_ref,  # scratch rolling validity window [B, W]
    *,
    width: int,
    mode: str,
    local: bool,
    trans: Tuple[float, float, float, float],
):
    j0 = pl.program_id(0)  # row index - 1
    d2d, d2m, i2i, i2m = trans
    B = member_ref.shape[0]
    W = width

    combine = jnp.maximum if mode == "viterbi" else jnp.logaddexp

    @pl.when(j0 == 0)
    def _init():
        neg = jnp.full((B, W), NEG_INF, jnp.float32)
        mat_ref[:] = neg
        ins_ref[:] = neg
        del_ref[:] = neg
        out_ref[:] = neg
        win_ref[:] = xs0_ref[:]
        vwin_ref[:] = vs0_ref[:]

    @pl.when(j0 > 0)
    def _advance():
        # slide the x-token window one lane: lane w takes lane w+1's value,
        # the streamed new column enters at lane W-1
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        newtok = rows_ref[0, C_NEWTOK, :][:, None]
        newvalid = rows_ref[0, C_NEWVALID, :][:, None]
        win_ref[:] = jnp.where(
            lane == W - 1, newtok, pltpu.roll(win_ref[:], jnp.int32(width - 1), 1)
        )
        vwin_ref[:] = jnp.where(
            lane == W - 1, newvalid, pltpu.roll(vwin_ref[:], jnp.int32(width - 1), 1)
        )

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    row = lambda c: rows_ref[0, c, :][:, None]  # [B, 1]

    row_valid = row(C_ROWVALID)
    valid = (member_ref[:] * vwin_ref[:] * row_valid) > 0.5

    # emission: 4-way select on the token window
    tok = win_ref[:]
    emit = jnp.where(tok == 0.0, row(C_EMIT0), NEG_INF)
    for a in (1, 2, 3):
        emit = jnp.where(tok == float(a), row(C_EMIT0 + a), emit)

    mat_p = mat_ref[:]
    ins_p = ins_ref[:]
    del_p = del_ref[:]

    # match state
    mat_c = combine(combine(mat_p + row(C_M2M), del_p + d2m), ins_p + i2m)
    start_row = row(C_STARTROW) > 0.5
    if local:
        start_ok = jnp.broadcast_to(start_row, (B, W))
    else:
        start_ok = start_row & (lane == row(C_WSTART).astype(jnp.int32))
    mat_c = combine(mat_c, jnp.where(start_ok, 0.0, NEG_INF))
    mat_c = jnp.where(valid, mat_c + emit, NEG_INF)

    # insert state: previous row, lane w+1
    def shift_hi(v):
        return jnp.where(lane == W - 1, NEG_INF, pltpu.roll(v, jnp.int32(W - 1), 1))

    def shift_lo(v):
        return jnp.where(lane == 0, NEG_INF, pltpu.roll(v, jnp.int32(1), 1))

    ins_c = row(C_INS_EMIT) + combine(
        shift_hi(ins_p) + i2i, shift_hi(mat_p) + row(C_M2I)
    )
    ins_c = jnp.where(valid, ins_c, NEG_INF)

    # delete state: Hillis-Steele scan over lanes in the (combine, +)
    # semiring; element = (carry weight C, value B)
    c_vec = jnp.where(valid, d2d, NEG_INF)
    b_vec = jnp.where(valid, shift_lo(mat_c) + row(C_M2D), NEG_INF)
    s = 1
    while s < W:
        c_s = jnp.where(lane >= s, pltpu.roll(c_vec, jnp.int32(s), 1), 0.0)
        b_s = jnp.where(lane >= s, pltpu.roll(b_vec, jnp.int32(s), 1), NEG_INF)
        b_vec = combine(b_s + c_vec, b_vec)
        c_vec = c_s + c_vec
        s *= 2
    del_c = jnp.where(valid, b_vec, NEG_INF)

    # end contribution on each pair's final row
    end_row = row(C_ENDROW) > 0.5
    if local:
        end_ok = valid & end_row
    else:
        end_ok = valid & end_row & (lane == row(C_WEND).astype(jnp.int32))
    contrib = jnp.where(end_ok, mat_c + row(C_M2E), NEG_INF)
    out_ref[:] = combine(out_ref[:], contrib)

    mat_ref[:] = mat_c
    ins_ref[:] = ins_c
    del_ref[:] = del_c


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("width", "b_pad"))
def _build_rows_device(tables_dev: dict, batch: dict, width: int, b_pad: int):
    """Device-side assembly of the streamed per-row constants and the
    rolling-window initialisation (jitted; the numpy builder below is the
    reference implementation used by tests).

    Everything is computed directly in the kernel's [rows, B] orientation:
    the int source arrays are transposed once, all emission/transition
    lookups are flat gathers in that layout, and per-row scalars broadcast
    — no per-channel relayouts."""
    x_tok = batch["x_tok"]
    x_len = batch["x_len"]
    y_len = batch["y_len"]
    d_lo = batch["d_lo"]
    member = batch["member"]

    B, W0 = member.shape
    Ly = batch["y_tok"].shape[1]
    W = width
    Bp = b_pad
    f32 = jnp.float32
    Q = tables_dev["insert_score"].shape[1]

    # transpose the int sources once: [Ly(+1), B]
    y_tok_t = batch["y_tok"].T
    y_mk_t = batch["y_match_kmer"].T
    y_qual_t = batch["y_qual"].T
    ik_t = batch["y_indel_kmer_pad"].T  # [Ly+1, B]
    hq = batch["y_has_qual"][None, :]  # [1, B]

    ms = tables_dev["match_score"].astype(f32)  # [4, Km, Q]
    msn = tables_dev["match_score_noq"].astype(f32)
    ins = tables_dev["insert_score"].astype(f32)
    insn = tables_dev["insert_score_noq"].astype(f32)

    y_mk32, y_tok32, y_q32 = (
        y_mk_t.astype(jnp.int32),
        y_tok_t.astype(jnp.int32),
        y_qual_t.astype(jnp.int32),
    )
    kq_t = y_mk32 * Q + y_q32  # [Ly, B] flat (kmer, qual) key
    tq_t = y_tok32 * Q + y_q32

    def padB(a):  # [Ly, B] -> [Ly, Bp] f32
        return jnp.pad(a.astype(f32), ((0, 0), (0, Bp - B)))

    chans = [None] * NUM_CHANNELS
    for a in range(4):
        vals = jnp.where(hq, ms[a].reshape(-1)[kq_t], msn[a][y_mk_t])
        chans[C_EMIT0 + a] = padB(vals)
    chans[C_INS_EMIT] = padB(jnp.where(hq, ins.reshape(-1)[tq_t], insn[y_tok_t]))
    chans[C_M2M] = padB(tables_dev["m2m"].astype(f32)[ik_t[:-1]])
    chans[C_M2I] = padB(tables_dev["m2i"].astype(f32)[ik_t[:-1]])
    chans[C_M2D] = padB(tables_dev["m2d"].astype(f32)[ik_t[1:]])
    chans[C_M2E] = padB(tables_dev["m2e"].astype(f32)[ik_t[1:]])

    # x tokens in band coordinates: xs[b, t] = x_tok[b, d_lo[b] + t]
    x_tok_t = x_tok.T  # [Lx, B]
    t_new = jnp.arange(Ly)[:, None] + (W - 1) + d_lo[None, :]  # [Ly, B]
    new_ok = (t_new >= 0) & (t_new < x_len[None, :])
    newtok = jnp.take_along_axis(
        x_tok_t, jnp.clip(t_new, 0, x_tok_t.shape[0] - 1), axis=0
    )
    chans[C_NEWTOK] = padB(jnp.where(new_ok, newtok, 0))
    chans[C_NEWVALID] = padB(new_ok)

    j = jnp.arange(1, Ly + 1)[:, None]  # [Ly, 1]
    chans[C_ROWVALID] = padB(j <= y_len[None, :])
    chans[C_ENDROW] = padB(j == y_len[None, :])
    chans[C_STARTROW] = jnp.broadcast_to((j == 1).astype(f32), (Ly, Bp))
    chans[C_WEND] = padB((x_len[None, :] - 1 - d_lo[None, :]) - (j - 1))
    chans[C_WSTART] = padB(-d_lo[None, :] - (j - 1))
    rows = jnp.stack(chans, axis=1)  # [Ly, NUM_CHANNELS, Bp]

    # initial window (rows j=1's view needs xs[:, 0:W])
    t0 = jnp.arange(W)[None, :] + d_lo[:, None]  # [B, W]
    ok0 = (t0 >= 0) & (t0 < x_len[:, None])
    xs0_b = jnp.where(
        ok0,
        jnp.take_along_axis(x_tok, jnp.clip(t0, 0, x_tok.shape[1] - 1), axis=1),
        0,
    )
    member_f = jnp.zeros((Bp, W), f32).at[:B, :W0].set(member.astype(f32))
    xs0 = jnp.zeros((Bp, W), f32).at[:B].set(xs0_b.astype(f32))
    vs0 = jnp.zeros((Bp, W), f32).at[:B].set(ok0.astype(f32))
    return rows, member_f, xs0, vs0


def build_row_stream_device(tables, tables_dev: dict, batch: dict) -> dict:
    """Fast path: jitted device-side stream assembly."""
    member = np.asarray(batch["member"])
    B, W0 = member.shape
    Ly = int(batch["y_tok"].shape[1])
    W = _round_up(max(W0, 128), 128)
    Bp = _round_up(B, 8)
    rows, member_f, xs0, vs0 = _build_rows_device(tables_dev, batch, W, Bp)
    return {
        "rows": rows,
        "member": member_f,
        "xs0": xs0,
        "vs0": vs0,
        "width": W,
        "batch": B,
        "b_pad": Bp,
        "n_rows": Ly,
        "trans": (
            float(tables.d2d),
            float(tables.d2m),
            float(tables.i2i),
            float(tables.i2m),
        ),
    }


def build_row_stream(tables, batch: dict) -> dict:
    """Host/XLA-side assembly of the kernel inputs from a standard device
    batch dict (see dp/engine.device_batch)."""
    x_tok = np.asarray(batch["x_tok"])
    x_len = np.asarray(batch["x_len"])
    y_tok = np.asarray(batch["y_tok"])
    y_mk = np.asarray(batch["y_match_kmer"])
    ik_pad = np.asarray(batch["y_indel_kmer_pad"])
    y_qual = np.asarray(batch["y_qual"])
    y_has_qual = np.asarray(batch["y_has_qual"])
    y_len = np.asarray(batch["y_len"])
    d_lo = np.asarray(batch["d_lo"])
    member = np.asarray(batch["member"])

    B, W0 = member.shape
    Ly = y_tok.shape[1]
    W = _round_up(max(W0, 128), 128)
    Bp = _round_up(B, 8)

    ms = np.asarray(tables.match_score, np.float32)
    msn = np.asarray(tables.match_score_noq, np.float32)
    ins = np.asarray(tables.insert_score, np.float32)
    insn = np.asarray(tables.insert_score_noq, np.float32)

    rows = np.full((Ly, NUM_CHANNELS, Bp), 0.0, np.float32)
    for a in range(4):
        vals_q = ms[a, y_mk, y_qual]  # [B, Ly]
        vals_n = msn[a, y_mk]
        rows[:, C_EMIT0 + a, :B] = np.where(
            y_has_qual[:, None], vals_q, vals_n
        ).T
    ins_q = ins[y_tok, y_qual]
    ins_n = insn[y_tok]
    rows[:, C_INS_EMIT, :B] = np.where(y_has_qual[:, None], ins_q, ins_n).T
    m2m = np.asarray(tables.m2m, np.float32)
    m2i = np.asarray(tables.m2i, np.float32)
    m2d = np.asarray(tables.m2d, np.float32)
    m2e = np.asarray(tables.m2e, np.float32)
    rows[:, C_M2M, :B] = m2m[ik_pad[:, :-1]].T  # score out of row j-1
    rows[:, C_M2I, :B] = m2i[ik_pad[:, :-1]].T
    rows[:, C_M2D, :B] = m2d[ik_pad[:, 1:]].T
    rows[:, C_M2E, :B] = m2e[ik_pad[:, 1:]].T

    # rolling x-token window: xs[b, t] = x_tok[b, d_lo[b] + t] for
    # t in [0, Ly + W); out-of-range positions are invalid
    t = np.arange(Ly + W)
    idx = d_lo[:, None] + t[None, :]  # [B, Ly+W]
    in_range = (idx >= 0) & (idx < x_len[:, None])
    xs = np.where(in_range, x_tok[np.arange(B)[:, None], np.clip(idx, 0, x_tok.shape[1] - 1)], 0)
    rows[:, C_NEWTOK, :B] = xs[:, W - 1 : W - 1 + Ly].T.astype(np.float32)
    rows[:, C_NEWVALID, :B] = in_range[:, W - 1 : W - 1 + Ly].T.astype(np.float32)

    j = np.arange(1, Ly + 1)
    rows[:, C_ROWVALID, :B] = (j[:, None] <= y_len[None, :]).astype(np.float32)
    rows[:, C_ENDROW, :B] = (j[:, None] == y_len[None, :]).astype(np.float32)
    rows[:, C_STARTROW, :] = (j[:, None] == 1).astype(np.float32)
    # lane of i == x_len (end) and i == 1 (start) per row, for -global
    rows[:, C_WEND, :B] = (x_len[None, :] - 1 - d_lo[None, :] - (j[:, None] - 1)).astype(
        np.float32
    )
    rows[:, C_WSTART, :B] = (-d_lo[None, :] - (j[:, None] - 1)).astype(np.float32)

    member_f = np.zeros((Bp, W), np.float32)
    member_f[:B, :W0] = member.astype(np.float32)
    xs0 = np.zeros((Bp, W), np.float32)
    xs0[:B] = xs[:, :W].astype(np.float32)
    vs0 = np.zeros((Bp, W), np.float32)
    vs0[:B] = in_range[:, :W].astype(np.float32)

    return {
        "rows": jnp.asarray(rows),
        "member": jnp.asarray(member_f),
        "xs0": jnp.asarray(xs0),
        "vs0": jnp.asarray(vs0),
        "width": W,
        "batch": B,
        "b_pad": Bp,
        "n_rows": Ly,
        "trans": (
            float(tables.d2d),
            float(tables.d2m),
            float(tables.i2i),
            float(tables.i2m),
        ),
    }


@functools.partial(
    jax.jit,
    static_argnames=("width", "b_pad", "n_rows", "mode", "local", "trans", "interpret"),
)
def pallas_fill_scores(
    rows, member, xs0, vs0, width, b_pad, n_rows, mode="viterbi",
    local=True, trans=(0.0, 0.0, 0.0, 0.0), interpret=False,
):
    """Run the kernel; returns the [B, W] lane-wise end accumulator."""
    kernel = functools.partial(
        _row_kernel, width=width, mode=mode, local=local, trans=trans
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec(
                (1, NUM_CHANNELS, b_pad), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((b_pad, width), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, width), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, width), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, width), lambda j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
            pltpu.VMEM((b_pad, width), jnp.float32),
        ],
        interpret=interpret,
    )(rows, member, xs0, vs0)
    return out


def viterbi_scores(tables, batch: dict, mode: str = "viterbi",
                   local: bool = True, interpret: bool = False,
                   tables_dev: dict = None):
    """End scores [B] for a device batch via the Pallas kernel."""
    if tables_dev is not None:
        stream = build_row_stream_device(tables, tables_dev, batch)
    else:
        stream = build_row_stream(tables, batch)
    out = pallas_fill_scores(
        stream["rows"], stream["member"], stream["xs0"], stream["vs0"],
        width=stream["width"], b_pad=stream["b_pad"], n_rows=stream["n_rows"],
        mode=mode, local=local, trans=stream["trans"], interpret=interpret,
    )
    B = stream["batch"]
    if mode == "viterbi":
        scores = jnp.max(out[:B], axis=1)
    else:
        scores = jax.nn.logsumexp(out[:B], axis=1)
    return jnp.where(scores <= NEG_INF / 2, -jnp.inf, scores)
