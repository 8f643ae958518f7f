"""Pallas banded fill, v2: self-contained kernel with in-kernel emission
lookup.

The earlier v1 design (removed) streamed precomputed per-row emission values, whose
XLA gather-based assembly costs ~2x the kernel itself and minutes of
compile time.  v2 eliminates that: the stream carries only small integer
keys per row (read (kmer,qual) key, insert key, indel-context ids), and
the kernel resolves emissions with a SPLIT one-hot lookup against the
VMEM-resident score tables — MXU work overlapping the VPU recursion:

  emit_kq[b, :] = onehot_km(kmer[b]) . table          ([B,Km] @ [Km,4*QP])
  emit[b, a]    = sum_q emit_kq[b, a*QP+q] * onehot_q(qual[b])[q]

(one [B,Km] MXU dot plus a VPU quality contraction, instead of one-hot
encoding the combined kmer*Q+qual key into [B, Km*Q] — 1504 lanes at
match order 1 — and paying a Km*Q-deep, 8-wide dot per row).

The x-token window is a resident int array sliced one column per row; all
validity masks (band membership aside) are computed in-kernel from
per-pair scalars (d_lo, x_len, y_len).  Host-side batch prep is pure
integer arithmetic — no gathers, no big f32 tensors.

State/dependency mapping is identical to v1 and dp/engine.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import QUAL_SCORE_RANGE

NEG_INF = float(np.finfo(np.float32).min)

# per-row streamed int32 channels
K_KQ = 0  # y_match_kmer * Q + y_qual (emission key)
K_TQ = 1  # y_tok * Q + y_qual (insert-emission key)
K_IK_PREV = 2  # indel k-mer context of row j-1 (padded)
K_IK_CUR = 3  # indel k-mer context of row j
K_NEWTOK = 4  # x token entering segment 0's window this row (-1 = none)
# channels 5, 6: same for packed segments 1, 2 (lane-packed strips);
# channels 7..9: tokens entering each segment when sweeping BACKWARD
# (used by the counts kernels)
K_OLDTOK0 = 7
K_QUAL = 10  # y quality value alone (0 when the read has no qualities)
MAX_SEGS = 3  # lane-packed strips per pair (more get merged)
NUM_KEYS = 12

# Mosaic scoped-VMEM ceiling shared by every quaff kernel.  The XLA
# default caps kernel stack allocations at 16 MiB; a v5e core has
# 128 MiB of physical VMEM, and raising the cap lets the score kernels
# run B*W = 512k-cell batches (measured optimum: B=2048 at W=256,
# +25% cells/s over the 16 MiB-bound B=512).
VMEM_LIMIT_BYTES = 100 * 1024 * 1024

# True once this process has dispatched a v2 score kernel: the first
# dispatch pays the axon remote compiler's server-side recompile
# (seconds even on a local cache hit), so small-workload gates route
# natively only while this is False (time-to-first-result) and use the
# already-warm kernel afterwards.
KERNEL_WARM = False

# lane-padded quality block: emission tables store each ref symbol's
# [Km, Q] slab in its own 128-lane block so per-symbol slices are
# lane-aligned (Q = 94 quality levels, padded with zeros to 128)
QP = 128

# sentinel diagonal for absent segments / padding lanes: far beyond any
# real x index, so idx-validity masks every row out
D_SENTINEL = 1 << 24


def _lse2_fast(a, b):
    """Fast log-add-exp for the kernels' f32 log-space recursions.

    jnp.logaddexp measures 51 ALU-op equivalents per element on v5e
    (inf/NaN guard branches + log1p); this runs at ~26: hardware log of
    (1 + exp(-|a-b|)) — which differs from log1p by < 1.2e-7 absolute,
    far below f32 resolution at DP-score magnitudes — plus ONE guard
    select for the both-operands-near--inf case (an f32-min sentinel sum
    can overflow to -inf, and -inf - -inf would turn the raw formula
    into NaN; returning the max is exact there since log2 is absorbed by
    rounding at 1e38 magnitudes).
    """
    m = jnp.maximum(a, b)
    r = m + jnp.log(1.0 + jnp.exp(-jnp.abs(a - b)))
    return jnp.where(m < -1e38, m, r)


def _sel_dot_exact(oh, table):
    """Bit-exact f32 one-hot selection dot in ONE default-precision MXU
    pass instead of HIGHEST's six.

    The f32 table splits into three bf16-exact chunks (top/middle/low 8
    mantissa bits — each difference is exactly representable, and each
    chunk survives the MXU's bf16 operand rounding unchanged); tiling
    the one-hot across the chunk axis makes a single K=3k contraction
    whose f32 accumulation reassembles the chunks exactly (the partial
    sums of one value's chunks always fit in 24 mantissa bits).  With
    k=16 kmers the contraction stays under the MXU's 128-deep pass, so
    this costs ONE pass where precision=HIGHEST costs six — and the
    selection is still bitwise equal to the f64-rounded-to-f32 table
    entry.
    """
    c1 = table.astype(jnp.bfloat16).astype(jnp.float32)
    r = table - c1
    c2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    c3 = r - c2
    chunks = jnp.concatenate([c1, c2, c3], axis=0)
    oh3 = jnp.concatenate([oh, oh, oh], axis=1)
    return jnp.dot(oh3, chunks, preferred_element_type=jnp.float32)


def _split_emission_lookup(keys_ref, emis_ref, insv_ref, r, B):
    """In-kernel emission resolution with SPLIT keys.

    The combined-key lookup one-hot-encoded kmer*Q+qual into a [B, Km*Q]
    matrix (1504 lanes at order 1) and paid a Km*Q-deep, 8-wide MXU dot
    per row.  Splitting the key into its kmer and quality parts makes it
    a [B, Km] one-hot MXU dot against the [Km, 4*QP] table followed by a
    cheap VPU contraction with a [B, QP] quality one-hot — and shrinks
    the VMEM-resident table from [Km*Q, 8] (lane-padded to 128) to
    [Km, 4*QP].

    Returns (emit_cols, ins_emit, oh_k, oh_q, oh_t): emit_cols is a
    4-tuple of [B, 1] emission columns (one per ref symbol), ins_emit is
    [B, 1], and the one-hots are reused by the counts kernel's transposed
    accumulation dots.
    """
    Q = QUAL_SCORE_RANGE
    kq = keys_ref[r, K_KQ, :]
    tq = keys_ref[r, K_TQ, :]
    qv = keys_ref[r, K_QUAL, :]
    oh_q = (
        jax.lax.broadcasted_iota(jnp.int32, (B, QP), 1) == qv[:, None]
    ).astype(jnp.float32)
    kmp = emis_ref.shape[0]
    # kq - qv == Q * kmer: compare against the scaled iota (no int div)
    oh_k = (
        jax.lax.broadcasted_iota(jnp.int32, (B, kmp), 1) * Q
        == (kq - qv)[:, None]
    ).astype(jnp.float32)
    emit_kq = _sel_dot_exact(oh_k, emis_ref[:])  # [B, 4*QP], 1 MXU pass
    emit_cols = tuple(
        jnp.sum(emit_kq[:, s * QP : (s + 1) * QP] * oh_q, axis=1)[:, None]
        for s in range(4)
    )
    oh_t = (
        jax.lax.broadcasted_iota(jnp.int32, (B, 8), 1) * Q
        == (tq - qv)[:, None]
    ).astype(jnp.float32)
    ins_kq = _sel_dot_exact(oh_t, insv_ref[:])  # [B, QP], 1 MXU pass
    ins_emit = jnp.sum(ins_kq * oh_q, axis=1)[:, None]
    return emit_cols, ins_emit, oh_k, oh_q, oh_t


def _split_tables(tables, has_q):
    """Emission tables for the split lookup.

    emis2 [Km_pad8, 4*QP]: emis2[k, s*QP + q] = match emission of read
    (k-mer k, quality q) given ref symbol s (match_score[s, k, q]).
    insv2 [8, QP]: insv2[t, q] = insert emission of read token t at
    quality q (rows 4..7 zero).  No-qual reads replicate the no-qual
    scores across the quality axis (their K_QUAL channel is 0).
    """
    Km = np.asarray(tables.match_score).shape[1]
    Q = QUAL_SCORE_RANGE
    kmp = _round_up(Km, 8)
    emis2 = np.zeros((kmp, 4 * QP), np.float32)
    ev = emis2.reshape(kmp, 4, QP)
    if has_q:
        ms = np.asarray(tables.match_score, np.float32)  # [4, Km, Q]
        ev[:Km, :, :Q] = ms.transpose(1, 0, 2)
    else:
        msn = np.asarray(tables.match_score_noq, np.float32)  # [4, Km]
        ev[:Km, :, :Q] = msn.T[:, :, None]
    insv2 = np.zeros((8, QP), np.float32)
    if has_q:
        insv2[:4, :Q] = np.asarray(tables.insert_score, np.float32)
    else:
        insv2[:4, :Q] = np.asarray(tables.insert_score_noq, np.float32)[
            :, None
        ]
    return emis2, insv2


def _advance_window(win_ref, keys_ref, snew_ref, r, B, W, n_segs=MAX_SEGS):
    """Slide every packed segment's token window one lane left and insert
    each segment's incoming token at its last lane (snew_ref holds the
    segment id at segment-last lanes, -1 elsewhere)."""
    win = pltpu.roll(win_ref[:], jnp.int32(W - 1), 1)
    slot = snew_ref[:]
    for k in range(n_segs):
        newcol = keys_ref[r, K_NEWTOK + k, :][:, None].astype(jnp.float32)
        win = jnp.where(slot == float(k), newcol, win)
    win_ref[:] = win


def _row_kernel(
    keys_ref,  # [R, NUM_KEYS, B] int32 streamed (R rows per grid step)
    emis_ref,  # [Km_pad, 4*QP] f32: split-layout match emissions
    insv_ref,  # [8, QP] f32: insert emissions (rows 0..3 per token)
    ik_ref,  # [Ki, 8] f32: m2m/m2i/m2d/m2e in cols 0..3
    member_ref,  # [B, W] f32 0/1
    xs0_ref,  # [B, W] f32: initial token window (row 1's view)
    meta_ref,  # [8, B] f32: x_len, y_len rows
    doff_ref,  # [B, W] f32: diagonal of each lane (segment-packed)
    snew_ref,  # [B, W] f32: segment id at segment-last lanes, else -1
    out_ref,  # [B, W] f32 accumulator
    mat_ref,
    ins_ref,
    del_ref,
    win_ref,
    *,
    width: int,
    mode: str,
    local: bool,
    rows_per_step: int = 1,
    n_segs: int = MAX_SEGS,
    n_ik: int = 0,
    max_prop=None,
):
    g = pl.program_id(0)
    for _r in range(rows_per_step):
        _one_row(
            keys_ref, emis_ref, insv_ref, ik_ref, member_ref, xs0_ref,
            meta_ref, doff_ref, snew_ref, out_ref, mat_ref, ins_ref,
            del_ref, win_ref,
            width=width, mode=mode, local=local,
            g=g, r=_r, rows_per_step=rows_per_step, n_segs=n_segs,
            n_ik=n_ik, max_prop=max_prop,
        )


def _one_row(
    keys_ref, emis_ref, insv_ref, ik_ref, member_ref, xs0_ref, meta_ref,
    doff_ref, snew_ref, out_ref, mat_ref, ins_ref, del_ref, win_ref,
    *, width, mode, local, g, r, rows_per_step, n_segs, n_ik,
    max_prop=None,
):
    j0 = g * rows_per_step + r
    # gap transitions ride meta rows 3-6 as device data (not compiled-in
    # constants): params change per EM iteration / per server job, and a
    # static tuple would recompile the kernel each time
    d2d = meta_ref[3, :][:, None]
    d2m = meta_ref[4, :][:, None]
    i2i = meta_ref[5, :][:, None]
    i2m = meta_ref[6, :][:, None]
    B = member_ref.shape[0]
    W = width
    combine = jnp.maximum if mode == "viterbi" else _lse2_fast

    if r == 0:
        @pl.when(g == 0)
        def _init():
            neg = jnp.full((B, W), NEG_INF, jnp.float32)
            mat_ref[:] = neg
            ins_ref[:] = neg
            del_ref[:] = neg
            out_ref[:] = neg
            win_ref[:] = xs0_ref[:]

        @pl.when(g > 0)
        def _advance():
            _advance_window(win_ref, keys_ref, snew_ref, r, B, W, n_segs)
    else:
        _advance_window(win_ref, keys_ref, snew_ref, r, B, W, n_segs)

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    x_len = meta_ref[1, :][:, None]
    y_len = meta_ref[2, :][:, None]

    jf = (j0 + 1).astype(jnp.float32)  # row number j
    idx = doff_ref[:] + (jf - 1.0)  # i - 1 per lane
    valid = (
        (member_ref[:] > 0.5)
        & (idx >= 0.0)
        & (idx < x_len)
        & (jf <= y_len)
    )

    # ---- in-kernel emission resolution (split one-hot lookup) ----
    emit_cols, ins_emit, _, _, _ = _split_emission_lookup(
        keys_ref, emis_ref, insv_ref, r, B
    )

    if n_ik == 1:
        # gap order 0 (the default): one indel context, so the per-row
        # transition "lookup" is just the table's first row — skips two
        # MXU one-hot dots per row
        m2m_j = ik_ref[0, 0]
        m2i_j = ik_ref[0, 1]
        m2d_j = ik_ref[0, 2]
        m2e_j = ik_ref[0, 3]
    else:
        ki = ik_ref.shape[0]
        ik_prev = keys_ref[r, K_IK_PREV, :]
        ik_cur = keys_ref[r, K_IK_CUR, :]
        oh_prev = (
            jax.lax.broadcasted_iota(jnp.int32, (B, ki), 1) == ik_prev[:, None]
        ).astype(jnp.float32)
        oh_cur = (
            jax.lax.broadcasted_iota(jnp.int32, (B, ki), 1) == ik_cur[:, None]
        ).astype(jnp.float32)
        tr_prev = _sel_dot_exact(oh_prev, ik_ref[:])
        tr_cur = _sel_dot_exact(oh_cur, ik_ref[:])
        m2m_j = tr_prev[:, 0][:, None]
        m2i_j = tr_prev[:, 1][:, None]
        m2d_j = tr_cur[:, 2][:, None]
        m2e_j = tr_cur[:, 3][:, None]

    # emission select on the token window
    tok = win_ref[:]
    emit = jnp.where(tok == 0.0, emit_cols[0], NEG_INF)
    for a in (1, 2, 3):
        emit = jnp.where(tok == float(a), emit_cols[a], emit)

    mat_p = mat_ref[:]
    ins_p = ins_ref[:]
    del_p = del_ref[:]

    mat_c = combine(combine(mat_p + m2m_j, del_p + d2m), ins_p + i2m)
    is_first_row = jf == 1.0
    if local:
        start_ok = jnp.broadcast_to(is_first_row, (B, W))
    else:
        start_ok = is_first_row & (idx == 0.0)
    mat_c = combine(mat_c, jnp.where(start_ok, 0.0, NEG_INF))
    mat_c = jnp.where(valid, mat_c + emit, NEG_INF)

    def shift_hi(v):
        return jnp.where(lane == W - 1, NEG_INF, pltpu.roll(v, jnp.int32(W - 1), 1))

    def shift_lo(v):
        return jnp.where(lane == 0, NEG_INF, pltpu.roll(v, jnp.int32(1), 1))

    ins_c = ins_emit + combine(shift_hi(ins_p) + i2i, shift_hi(mat_p) + m2i_j)
    ins_c = jnp.where(valid, ins_c, NEG_INF)

    c_vec = jnp.where(valid, d2d, NEG_INF)
    b_vec = jnp.where(valid, shift_lo(mat_c) + m2d_j, NEG_INF)
    # the max-plus scan only needs to reach across the WIDEST lane-packed
    # strip, not the padded width: non-member halo lanes reset c_vec to
    # -inf, so legal propagation never crosses a strip seam — callers
    # that know the max strip width pass it (pow2) to drop scan steps
    # (strips <= 128 on a W=256 pack: 7 steps instead of 8)
    reach = W if max_prop is None else min(int(max_prop), W)
    s = 1
    while s < reach:
        c_s = jnp.where(lane >= s, pltpu.roll(c_vec, jnp.int32(s), 1), 0.0)
        b_s = jnp.where(lane >= s, pltpu.roll(b_vec, jnp.int32(s), 1), NEG_INF)
        b_vec = combine(b_s + c_vec, b_vec)
        c_vec = c_s + c_vec
        s *= 2
    del_c = jnp.where(valid, b_vec, NEG_INF)

    end_row = jf == y_len
    if local:
        end_ok = valid & end_row
    else:
        end_ok = valid & end_row & (idx == x_len - 1.0)
    out_ref[:] = combine(out_ref[:], jnp.where(end_ok, mat_c + m2e_j, NEG_INF))

    mat_ref[:] = mat_c
    ins_ref[:] = ins_c
    del_ref[:] = del_c


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def prepare_inputs(tables, batch: dict) -> dict:
    """Pure-integer host prep: keys, band-coordinate tokens, metadata."""
    Q = QUAL_SCORE_RANGE
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
    Km = np.asarray(tables.match_score).shape[1]

    assert bool(np.all(y_has_qual)) or not bool(np.any(y_has_qual)), (
        "v2 kernel batches must be homogeneous in quality presence"
    )
    has_q = bool(np.all(y_has_qual))

    keys = np.zeros((Ly, NUM_KEYS, Bp), np.int32)
    y_mk32 = y_mk.astype(np.int32)
    y_tok32 = y_tok.astype(np.int32)
    y_q32 = y_qual.astype(np.int32)
    keys[:, K_KQ, :B] = (y_mk32 * Q + y_q32).T
    keys[:, K_TQ, :B] = (y_tok32 * Q + y_q32).T
    keys[:, K_IK_PREV, :B] = ik_pad[:, :-1].T
    keys[:, K_IK_CUR, :B] = ik_pad[:, 1:].T
    keys[:, K_QUAL, :B] = y_q32.T

    # emission tables in split-lookup layout
    emis, insv = _split_tables(tables, has_q)

    ik_tab = np.stack(
        [
            np.asarray(tables.m2m, np.float32),
            np.asarray(tables.m2i, np.float32),
            np.asarray(tables.m2d, np.float32),
            np.asarray(tables.m2e, np.float32),
        ],
        axis=1,
    )  # [Ki, 4]
    ik_tab = np.pad(
        ik_tab, ((0, _round_up(ik_tab.shape[0], 8) - ik_tab.shape[0]), (0, 4))
    )

    # x tokens in band coordinates (out-of-range -> -1 so no symbol matches
    # and the emission resolves to NEG_INF, masking the lane)
    t = np.arange(Ly + W)
    idx = d_lo[:, None] + t[None, :]
    in_range = (idx >= 0) & (idx < x_len[:, None])
    xs = np.where(
        in_range,
        x_tok[np.arange(B)[:, None], np.clip(idx, 0, x_tok.shape[1] - 1)],
        -1,
    ).astype(np.int32)
    keys[:, K_NEWTOK, :B] = xs[:, W - 1 : W - 1 + Ly].T
    xs0 = np.full((Bp, W), -1.0, np.float32)
    xs0[:B] = xs[:, :W].astype(np.float32)

    meta = np.zeros((8, Bp), np.float32)
    meta[1, :B] = x_len
    meta[2, :B] = y_len
    meta[3, :] = float(tables.d2d)
    meta[4, :] = float(tables.d2m)
    meta[5, :] = float(tables.i2i)
    meta[6, :] = float(tables.i2m)
    member_f = np.zeros((Bp, W), np.float32)
    member_f[:B, :W0] = member.astype(np.float32)

    # single-segment lane tables (host prep does not pack strips)
    lane = np.arange(W, dtype=np.int64)[None, :]
    doff = np.full((Bp, W), float(D_SENTINEL), np.float32)
    doff[:B] = (d_lo[:, None] + lane).astype(np.float32)
    snew = np.full((Bp, W), -1.0, np.float32)
    snew[:B, W - 1] = 0.0

    return {
        "keys": jnp.asarray(keys),
        "emis": jnp.asarray(emis),
        "insv": jnp.asarray(insv),
        "ik": jnp.asarray(ik_tab),
        "member": jnp.asarray(member_f),
        "xs0": jnp.asarray(xs0),
        "meta": jnp.asarray(meta),
        "doff": jnp.asarray(doff),
        "snew": jnp.asarray(snew),
        "width": W,
        "batch": B,
        "b_pad": Bp,
        "n_rows": Ly,
        "n_ik": int(np.asarray(tables.m2m).shape[0]),
        "trans": (
            float(tables.d2d),
            float(tables.d2m),
            float(tables.i2i),
            float(tables.i2m),
        ),
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "b_pad", "n_rows", "mode", "local", "interpret",
        "rows_per_step", "n_segs", "n_ik", "max_prop",
    ),
)
def fill_v2(
    keys, emis, insv, ik, member, xs0, meta, doff, snew,
    width, b_pad, n_rows, mode="viterbi", local=True,
    interpret=False, rows_per_step=1,
    n_segs=MAX_SEGS, n_ik=0, max_prop=None,
):
    R = rows_per_step
    n_steps = -(-n_rows // R)
    if keys.shape[0] < n_steps * R:
        keys = jnp.pad(keys, ((0, n_steps * R - keys.shape[0]), (0, 0), (0, 0)))
    kernel = functools.partial(
        _row_kernel, width=width, mode=mode, local=local,
        rows_per_step=R, n_segs=n_segs, n_ik=n_ik, max_prop=max_prop,
    )
    resident = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (R, NUM_KEYS, b_pad), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            resident(emis.shape),
            resident(insv.shape),
            resident(ik.shape),
            resident((b_pad, width)),
            resident(xs0.shape),
            resident(meta.shape),
            resident((b_pad, width)),
            resident((b_pad, width)),
        ],
        out_specs=resident((b_pad, width)),
        out_shape=jax.ShapeDtypeStruct((b_pad, width), jnp.float32),
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
    return out


def scores_v2(tables, batch: dict, mode: str = "viterbi", local: bool = True,
              interpret: bool = False):
    prep = prepare_inputs(tables, batch)
    out = fill_v2(
        prep["keys"], prep["emis"], prep["insv"], prep["ik"], prep["member"],
        prep["xs0"], prep["meta"], prep["doff"], prep["snew"],
        width=prep["width"], b_pad=prep["b_pad"], n_rows=prep["n_rows"],
        mode=mode, local=local, interpret=interpret,
        n_segs=1, n_ik=prep["n_ik"],
    )
    B = prep["batch"]
    # end-reduction on the host: the band row is tiny, and eager device
    # ops each pay a per-op compile/dispatch on remotely-attached
    # accelerators (one fetch beats five micro-kernels)
    o = np.asarray(out)[:B].astype(np.float64)
    if mode == "viterbi":
        s = o.max(axis=1)
    else:
        m = o.max(axis=1)
        safe = np.where(np.isfinite(m), m, 0.0)
        s = safe + np.log(np.sum(np.exp(o - safe[:, None]), axis=1))
        s = np.where(np.isfinite(m), s, -np.inf)
    return np.where(s <= NEG_INF / 2, -np.inf, s)


def _roll_rows_per_column(v, shift):
    """v[(r + shift[b]) mod L, b] for all rows r — a per-column variable
    roll along the sublane axis, via binary decomposition of the shift
    into log2(L) masked fixed rolls.  Replaces take_along_axis gathers
    (which serialize on TPU: measured ~20-35 ms per [6604, 256] gather on
    v5e vs sub-ms for the rolls) for banded index patterns of the form
    `row + per-pair-offset`."""
    L = v.shape[0]
    s = jnp.mod(shift.astype(jnp.int32), L)
    nbits = max(1, (L - 1).bit_length())
    for k in range(nbits):
        bit = (s >> k) & 1
        v = jnp.where(bit[None, :] > 0, jnp.roll(v, -(1 << k), axis=0), v)
    return v


def _roll_lanes_per_row(v, shift):
    """v[b, (l + shift[b]) mod L] for all lanes l — the lane-axis variant
    of _roll_rows_per_column."""
    L = v.shape[1]
    s = jnp.mod(shift.astype(jnp.int32), L)
    nbits = max(1, (L - 1).bit_length())
    for k in range(nbits):
        bit = (s >> k) & 1
        v = jnp.where(bit[:, None] > 0, jnp.roll(v, -(1 << k), axis=1), v)
    return v


def _cyclic_rows(v, n):
    """First n rows of v extended cyclically: out[r] = v[r mod L].
    Needed because the variable-roll "gather" is modular — positions past
    L wrap, and the validity masks (not padding) decide which lanes are
    real."""
    L = v.shape[0]
    if L < n:
        v = jnp.concatenate([v] * (-(-n // L)), axis=0)
    return v[:n]


def _cyclic_lanes(v, n):
    """First n lanes of v extended cyclically along axis 1."""
    L = v.shape[1]
    if L < n:
        v = jnp.concatenate([v] * (-(-n // L)), axis=1)
    return v[:, :n]


def _segment_arrays(batch: dict, width: int):
    """Per-pair segment descriptors as [B, MAX_SEGS] int32 arrays
    (seg_d_lo, seg_start, seg_width).  Packed batches carry them; legacy
    single-window batches synthesize one segment spanning the full padded
    width (reproducing the original single-roll behaviour exactly)."""
    if "seg_d_lo" in batch:
        return (
            batch["seg_d_lo"].astype(jnp.int32),
            batch["seg_start"].astype(jnp.int32),
            batch["seg_width"].astype(jnp.int32),
        )
    # legacy single-window batches: ONE segment spanning the padded
    # width (the [B, 1] shape statically tells every consumer to emit
    # single-segment code)
    d_lo = batch["d_lo"].astype(jnp.int32)
    B = d_lo.shape[0]
    zeros = jnp.zeros((B,), jnp.int32)
    seg_d_lo = d_lo[:, None]
    seg_start = zeros[:, None]
    seg_width = (zeros + width)[:, None]
    return seg_d_lo, seg_start, seg_width


def _lane_tables(seg_d_lo, seg_start, seg_width, width, B, Bp):
    """Resident per-lane arrays from segment descriptors: diagonal of each
    lane (doff), segment id at segment-last lanes (snew) and segment-first
    lanes (sold), -1 elsewhere.  Lanes outside every segment get the
    D_SENTINEL diagonal (always invalid)."""
    lane = jnp.arange(width, dtype=jnp.int32)[None, :]  # [1, W]
    doff = jnp.full((B, width), D_SENTINEL, jnp.int32)
    snew = jnp.full((B, width), -1, jnp.int32)
    sold = jnp.full((B, width), -1, jnp.int32)
    for k in range(seg_d_lo.shape[1]):
        start = seg_start[:, k][:, None]
        wk = seg_width[:, k][:, None]
        dlo = seg_d_lo[:, k][:, None]
        in_seg = (wk > 0) & (lane >= start) & (lane < start + wk)
        doff = jnp.where(in_seg, dlo + (lane - start), doff)
        snew = jnp.where((wk > 0) & (lane == start + wk - 1), k, snew)
        sold = jnp.where((wk > 0) & (lane == start), k, sold)

    def padBp(a):
        out = jnp.full((Bp, width), D_SENTINEL if a is doff else -1, jnp.float32)
        return out.at[:B].set(a.astype(jnp.float32))

    return padBp(doff), padBp(snew), padBp(sold), doff


@functools.partial(jax.jit, static_argnames=("width", "b_pad"))
def _prepare_device(tables_small: dict, batch: dict, width: int, b_pad: int):
    """Device-side input prep from an already-transferred batch dict —
    integer transposes and arithmetic only, so nothing large crosses the
    host-device link per call (critical when the accelerator is attached
    over a network tunnel).  Supports lane-packed strip batches
    (seg_* descriptor fields) and legacy single-window batches."""
    Q = QUAL_SCORE_RANGE
    x_tok = batch["x_tok"]
    x_len = batch["x_len"]
    y_len = batch["y_len"]
    member = batch["member"]
    B, W0 = member.shape
    Ly = batch["y_tok"].shape[1]
    W, Bp = width, b_pad

    def padB(a):  # [Ly, B] int -> [Ly, Bp] int32
        return jnp.pad(a.astype(jnp.int32), ((0, 0), (0, Bp - B)))

    # widen before arithmetic: the transfer dtypes may be int8/int16
    ykm32 = batch["y_match_kmer"].astype(jnp.int32)
    yq32 = batch["y_qual"].astype(jnp.int32)
    kq = padB((ykm32 * Q + yq32).T)
    tq = padB((batch["y_tok"].astype(jnp.int32) * Q + yq32).T)
    ik_t = batch["y_indel_kmer_pad"].T
    ik_prev = padB(ik_t[:-1])
    ik_cur = padB(ik_t[1:])

    seg_d_lo, seg_start, seg_width = _segment_arrays(batch, W)
    doff_f, snew_f, sold_f, doff_i = _lane_tables(
        seg_d_lo, seg_start, seg_width, W, B, Bp
    )

    # per-segment incoming tokens for the forward roll: segment k's last
    # lane has diagonal seg_d_lo + seg_width - 1; the token entering at
    # (0-based) row r is x[d_last + r].  t = r + d is a banded index, so
    # the "gather" is a per-column variable roll.
    rows = jnp.arange(Ly, dtype=jnp.int32)[:, None]  # [Ly, 1]
    x_tok_t = x_tok.astype(jnp.int32).T  # [Lx, B]
    Lx = x_tok_t.shape[0]
    n_segs = seg_d_lo.shape[1]
    newtoks = []
    for k in range(n_segs):
        d_last = seg_d_lo[:, k] + jnp.maximum(seg_width[:, k] - 1, 0)
        t_new = rows + d_last[None, :]  # [Ly, B]
        ok_new = (
            (seg_width[None, :, k] > 0) & (t_new >= 0) & (t_new < x_len[None, :])
        )
        rolled = _cyclic_rows(_roll_rows_per_column(x_tok_t, d_last), Ly)
        newtoks.append(padB(jnp.where(ok_new, rolled, -1)))
    zeros = jnp.zeros_like(kq)
    qv = padB(yq32.T)
    keys = jnp.stack(
        [kq, tq, ik_prev, ik_cur]
        + newtoks + [zeros] * (K_OLDTOK0 - 4 - n_segs)  # rows 4..6
        + [zeros] * 3  # K_OLDTOK rows 7..9 (counts kernels .set() them)
        + [qv]  # K_QUAL = 10
        + [zeros] * (NUM_KEYS - K_QUAL - 1),
        axis=1,
    )

    # initial window (row 1): token at each lane's own diagonal.  Within
    # segment k, doff = seg_d_lo + (lane - seg_start): again a banded
    # index -> per-row lane roll by (seg_d_lo - seg_start), one per
    # segment, selected by membership.
    t0 = doff_i  # [B, W] int32
    ok0 = (t0 >= 0) & (t0 < x_len[:, None])
    x_tok_l = x_tok.astype(jnp.int32)  # [B, Lx]
    xs0_b = jnp.full((B, W), -1, jnp.int32)
    lane_w = jnp.arange(W, dtype=jnp.int32)[None, :]
    for k in range(n_segs):
        start = seg_start[:, k][:, None]
        wk = seg_width[:, k][:, None]
        in_seg = (wk > 0) & (lane_w >= start) & (lane_w < start + wk)
        rolled = _cyclic_lanes(_roll_lanes_per_row(
            x_tok_l, seg_d_lo[:, k] - seg_start[:, k]
        ), W)
        xs0_b = jnp.where(in_seg, rolled, xs0_b)
    xs0_b = jnp.where(ok0, xs0_b, -1)
    xs0 = jnp.full((Bp, W), -1.0, jnp.float32).at[:B].set(xs0_b.astype(jnp.float32))

    meta = jnp.zeros((8, Bp), jnp.float32)
    meta = meta.at[1, :B].set(x_len.astype(jnp.float32))
    meta = meta.at[2, :B].set(y_len.astype(jnp.float32))
    member_f = jnp.zeros((Bp, W), jnp.float32).at[:B, :W0].set(
        member.astype(jnp.float32)
    )
    return keys, xs0, meta, member_f, doff_f, snew_f, sold_f


class V2Tables:
    """Small per-params device tables for the v2 kernel."""

    def __init__(self, tables, has_qual: bool = True):
        emis, insv = _split_tables(tables, has_qual)
        ik_tab = np.stack(
            [
                np.asarray(tables.m2m, np.float32),
                np.asarray(tables.m2i, np.float32),
                np.asarray(tables.m2d, np.float32),
                np.asarray(tables.m2e, np.float32),
            ],
            axis=1,
        )
        self.n_ik = ik_tab.shape[0]
        ik_tab = np.pad(
            ik_tab, ((0, _round_up(ik_tab.shape[0], 8) - ik_tab.shape[0]), (0, 4))
        )
        self.emis = jnp.asarray(emis)
        self.insv = jnp.asarray(insv)
        self.ik = jnp.asarray(ik_tab)
        self.trans = (
            float(tables.d2d),
            float(tables.d2m),
            float(tables.i2i),
            float(tables.i2m),
        )


def scores_v2_traceable(v2tab, batch: dict, mode: str = "viterbi",
                        local: bool = True, rows_per_step: int = 1,
                        interpret: bool = False,
                        return_segments: bool = False,
                        max_prop: int = None):
    """Jit-traceable device path: prep + kernel + end reduction, with no
    host round-trips — suitable for wrapping in an outer `jax.jit`
    (the driver's single-chip compile check uses this).  `v2tab` is any
    object with .emis/.insv/.ik device arrays and a .trans 4-sequence
    (d2d, d2m, i2i, i2m) — converted to a traced f32 array, so changing
    params does NOT recompile.

    With return_segments=True (lane-packed batches only, Viterbi mode)
    returns the packed [B + B*S] array of pair scores followed by
    row-major per-strip end maxima — strips are lane-isolated DP
    subproblems (halo lanes block the in-row recursions at seams), so
    the max over segment k's lane range is that strip's own end score,
    in pack_strips order.  The aligner uses these to fill only
    near-best strips in the winner traceback pass.

    The production eager path (`scores_v2_device`) instead fetches the
    band row and reduces host-side — see the comment there for why.
    """
    member = batch["member"]
    B, W0 = member.shape
    Ly = int(batch["y_tok"].shape[1])
    W = _round_up(max(int(W0), 128), 128)
    Bp = _round_up(int(B), 8)
    n_segs = int(batch["seg_d_lo"].shape[1]) if "seg_d_lo" in batch else 1
    keys, xs0, meta, member_f, doff, snew, _ = _prepare_device(
        {}, batch, W, Bp
    )
    meta = meta.at[3:7, :].set(
        jnp.broadcast_to(
            jnp.asarray(v2tab.trans, jnp.float32)[:, None], (4, Bp)
        )
    )
    out = fill_v2(
        keys, v2tab.emis, v2tab.insv, v2tab.ik, member_f, xs0, meta,
        doff, snew,
        width=W, b_pad=Bp, n_rows=Ly, mode=mode, local=local,
        rows_per_step=rows_per_step, interpret=interpret,
        n_segs=n_segs, n_ik=int(getattr(v2tab, "n_ik", 0)),
        max_prop=max_prop,
    )
    o = out[:B]
    if return_segments:
        if "seg_start" not in batch:
            raise ValueError("return_segments needs a lane-packed batch")
        if mode != "viterbi":
            raise ValueError("return_segments is Viterbi-only")
        lane = jnp.arange(o.shape[1], dtype=jnp.int32)[None, None, :]
        lo = jnp.asarray(batch["seg_start"], jnp.int32)[:, :, None]
        hi = lo + jnp.asarray(batch["seg_width"], jnp.int32)[:, :, None]
        in_seg = (lane >= lo) & (lane < hi)
        segmax = jnp.max(
            jnp.where(in_seg, o[:, None, :], NEG_INF), axis=2
        )
        segmax = jnp.where(segmax <= NEG_INF / 2, -jnp.inf, segmax)
        s = jnp.max(o, axis=1)
        s = jnp.where(s <= NEG_INF / 2, -jnp.inf, s)
        return jnp.concatenate([s, segmax.ravel()])
    if mode == "viterbi":
        s = jnp.max(o, axis=1)
    else:
        m = jnp.max(o, axis=1)
        safe = jnp.where(jnp.isfinite(m), m, 0.0)
        s = safe + jnp.log(jnp.sum(jnp.exp(o - safe[:, None]), axis=1))
        s = jnp.where(jnp.isfinite(m), s, -jnp.inf)
    return jnp.where(s <= NEG_INF / 2, -jnp.inf, s)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mode", "local", "rows_per_step", "return_segments", "max_prop"
    ),
)
def _scores_v2_jit(emis, insv, ik, batch, trans4, mode, local,
                   rows_per_step=1, return_segments=False, max_prop=None):
    import types

    tab = types.SimpleNamespace(emis=emis, insv=insv, ik=ik, trans=trans4)
    return scores_v2_traceable(
        tab, batch, mode=mode, local=local, rows_per_step=rows_per_step,
        return_segments=return_segments, max_prop=max_prop,
    )


def batch_max_prop(batch) -> "int | None":
    """Static del-scan reach for a host PairBatch: the max lane-packed
    strip width, pow2-rounded (compile variants stay bounded).  None for
    non-packed batches (full-width scan)."""
    sw = getattr(batch, "seg_width", None)
    if sw is None:
        return None
    m = int(np.max(sw))
    if m <= 0:
        return None
    p = 1
    while p < m:
        p *= 2
    return p


def scores_v2_device(tables, v2tab: "V2Tables", batch: dict,
                     mode: str = "viterbi", local: bool = True,
                     rows_per_step: int = 1,
                     return_segments: bool = False,
                     defer_fetch: bool = False,
                     max_prop: int = None):
    # rows_per_step > 1 trades grid-dispatch overhead for VMEM block size;
    # measured slower on v5e at W=512 (71ms -> 87ms at R=8), so default 1
    """Production path: one jit = one dispatch (prep + kernel + end
    reduction fused), one [B]-float fetch.  Measured ~8% faster than the
    previous eager 3-dispatch + [B,W]-fetch variant at B=256/W=512 on the
    tunnelled v5e (91.6 ms vs 99.5 ms).

    return_segments=True also returns the per-strip end maxima [B, S]
    (see scores_v2_traceable); with defer_fetch=True the UNFETCHED
    packed [B + B*S] device array is returned instead, so callers
    dispatching many chunks through a tunnelled device drain them all
    after the last enqueue rather than paying one RTT per chunk."""
    # the process's first dispatch pays the axon server-side kernel
    # recompile (seconds); the small-workload native gates key off this
    global KERNEL_WARM
    KERNEL_WARM = True
    dev = _scores_v2_jit(
        v2tab.emis, v2tab.insv, v2tab.ik, batch,
        jnp.asarray(v2tab.trans, jnp.float32),
        mode=mode, local=local,
        rows_per_step=rows_per_step, return_segments=return_segments,
        max_prop=max_prop,
    )
    if return_segments:
        if defer_fetch:
            return dev
        B = batch["member"].shape[0]
        n_segs = batch["seg_start"].shape[1]
        packed = np.asarray(dev, dtype=np.float64)
        s = packed[:B]
        s = np.where(np.isfinite(s) & (s > NEG_INF / 2), s, -np.inf)
        return s, packed[B:].reshape(B, n_segs)
    s = np.asarray(dev).astype(np.float64)
    return np.where(np.isfinite(s) & (s > NEG_INF / 2), s, -np.inf)
