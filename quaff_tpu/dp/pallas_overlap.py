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
order 0; gap order > 0 is supported in-kernel too, with the separable
m2* transitions carried as extra x gap windows and y row channels
(TPU-validated byte-identical to the gaporder1 oracle).

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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alphabet import ALPHABET_SIZE, QUAL_SCORE_RANGE
from .pallas_v2 import (
    NEG_INF,
    VMEM_LIMIT_BYTES,
    _cyclic_lanes,
    _lse2_fast,
    _roll_lanes_per_row,
    _round_up,
)

# streamed per-row channels (f32)
C_MSY0 = 0  # ..3: y-side match score given ref symbol r (strand-folded)
C_INSY = 4  # y-side insert emission
C_NEW = 5  # + seg*5 + w: incoming column for x-side window w of segment
#            seg (w = 0..3: msX[r], w = 4: insert window)
MAX_SEGS = 3  # lane-packed strips per pair (more get merged)

# True once this process has dispatched an overlap score kernel (see
# pallas_v2.KERNEL_WARM — same time-to-first-result gate).
KERNEL_WARM = False
NUM_CH = 24

# gap-order->0 layout: two extra y channels (gap-open at the current row,
# gap-stay at the previous row) and two extra x-side windows per segment
# (gap-open / gap-stay along the band), so the position-dependent
# m2m/m2i/m2d transitions (qoverlap.h:43-45) resolve per cell:
#   m2i(i, j-1)   = open_x(i)                      (current window)
#   m2m(i-1, j-1) = stay_x(i-1) + stay_y(j-1)      (lane shift + C_G1YP)
#   m2d(i-1, j)   = stay_x(i-1) + open_y(j)        (lane shift + C_GOY)
C_GOY = 5
C_G1YP = 6
C_NEW_IK = 7  # + seg*7 + w (w = 0..3: msX[r], 4: insert, 5: open, 6: stay)
NUM_CH_IK = 32


def _ov_kernel(
    *refs,
    width: int,
    n_segs: int = 1,
    use_ik: bool = False,
):
    if use_ik:
        (rows_ref, member_ref, a0_ref, a1_ref, a2_ref, a3_ref, c0_ref,
         go0_ref, g10_ref, meta_ref, doff_ref, snew_ref, out_ref,
         mat_ref, ins_ref, del_ref,
         wa0_ref, wa1_ref, wa2_ref, wa3_ref, wc_ref,
         wgo_ref, wg1_ref) = refs
    else:
        (rows_ref, member_ref, a0_ref, a1_ref, a2_ref, a3_ref, c0_ref,
         meta_ref, doff_ref, snew_ref, out_ref,
         mat_ref, ins_ref, del_ref,
         wa0_ref, wa1_ref, wa2_ref, wa3_ref, wc_ref) = refs
    j0 = pl.program_id(0)
    # transitions ride meta rows 4-12 as device data (not compiled-in
    # constants), so per-job params do not recompile the kernel.  At gap
    # order > 0 the m2* transitions are per-cell instead (see C_GOY).
    if not use_ik:
        m2m_t = meta_ref[4, :][:, None]
        m2i_t = meta_ref[5, :][:, None]
        m2d_t = meta_ref[6, :][:, None]
    i2m_e = meta_ref[7, :][:, None]
    i2i_e = meta_ref[8, :][:, None]
    i2d_e = meta_ref[9, :][:, None]
    d2m_e = meta_ref[10, :][:, None]
    d2i_e = meta_ref[11, :][:, None]
    d2d_e = meta_ref[12, :][:, None]
    B = member_ref.shape[0]
    W = width
    lse = _lse2_fast

    wins = [wa0_ref, wa1_ref, wa2_ref, wa3_ref, wc_ref]
    inits = [a0_ref, a1_ref, a2_ref, a3_ref, c0_ref]
    if use_ik:
        wins += [wgo_ref, wg1_ref]
        inits += [go0_ref, g10_ref]
    c_new = C_NEW_IK if use_ik else C_NEW
    stride = 7 if use_ik else 5

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
        slot = snew_ref[:]
        for w, w_ref in enumerate(wins):
            win = pltpu.roll(w_ref[:], jnp.int32(W - 1), 1)
            for k in range(n_segs):
                newcol = rows_ref[0, c_new + k * stride + w, :][:, None]
                win = jnp.where(slot == float(k), newcol, win)
            w_ref[:] = win

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    x_len = meta_ref[1, :][:, None]
    y_len = meta_ref[2, :][:, None]
    j_off = meta_ref[3, :][:, None]
    jf = j_off + (j0 + 1).astype(jnp.float32)  # true row per pair
    idx = doff_ref[:] + (jf - 1.0)
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

    def shift_hi(v):
        return jnp.where(lane == W - 1, NEG_INF, pltpu.roll(v, jnp.int32(W - 1), 1))

    def shift_lo(v):
        return jnp.where(lane == 0, NEG_INF, pltpu.roll(v, jnp.int32(1), 1))

    if use_ik:
        # per-cell transitions from the x-side gap windows and the y
        # channels.  Lane w-1 holds x index i-1 within a segment; at
        # segment seams the shifted value is wrong but those cells are
        # halo lanes (member False), so every path through them is
        # already -inf.
        goy = rows_ref[0, C_GOY, :][:, None]
        g1yp = rows_ref[0, C_G1YP, :][:, None]
        stay_xm1 = shift_lo(wg1_ref[:])
        m2m_t = stay_xm1 + g1yp
        m2i_t = wgo_ref[:]
        m2d_t = stay_xm1 + goy

    mat_c = jnp.maximum(
        jnp.maximum(mat_p + m2m_t, del_p + d2m_e), ins_p + i2m_e
    )
    start_ok = (jf == 1.0) | (idx == 0.0)
    mat_c = jnp.maximum(mat_c, jnp.where(start_ok, 0.0, NEG_INF))
    mat_c = jnp.where(valid, mat_c + emit, NEG_INF)

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
    static_argnames=("width", "b_pad", "n_rows", "n_segs",
                     "interpret"),
)
def _ov_fill(rows, member, a0, a1, a2, a3, c0, meta, doff, snew,
             width, b_pad, n_rows, n_segs=1, interpret=False,
             go0=None, g10=None):
    use_ik = go0 is not None
    kernel = functools.partial(
        _ov_kernel, width=width, n_segs=n_segs, use_ik=use_ik
    )
    resident = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    n_ch = NUM_CH_IK if use_ik else NUM_CH
    n_win = 7 if use_ik else 5
    args = [rows, member, a0, a1, a2, a3, c0]
    if use_ik:
        args += [go0, g10]
    args += [meta, doff, snew]
    out = pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[
            pl.BlockSpec((1, n_ch, b_pad), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [resident((b_pad, width))] * (6 + (2 if use_ik else 0))
        + [
            resident(meta.shape),
            resident((b_pad, width)),
            resident((b_pad, width)),
        ],
        out_specs=resident((b_pad, width)),
        out_shape=jax.ShapeDtypeStruct((b_pad, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, width), jnp.float32)]
        * (3 + n_win),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
    )(*args)
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
    if tables.indel_kmer_len > 0:
        tabs["lgo"] = jnp.asarray(
            np.asarray(tables.log_gap_open, np.float32)
        )  # [Ki]
        tabs["lg1m"] = jnp.asarray(
            np.asarray(tables.log_gap_stay, np.float32)
        )
    tables._ov_tabs_cache = tabs
    return tabs


def _ctx_kmers_device(tok, mf, k):
    """Per-position k-mer context codes (alphabet.context_kmers semantics:
    code of the k-mer ENDING at p, left-padded with the row's most
    frequent token mf) for a [N, L] token bank, derived on device —
    shipping precomputed context arrays through a ~10 MB/s tunnel costs
    more than the tokens themselves."""
    if k == 0:
        return jnp.zeros_like(tok)
    L = tok.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    code = jnp.zeros_like(tok)
    for j in range(k):
        tj = jnp.roll(tok, j, axis=1)  # tj[p] = tok[p - j] (cyclic)
        tj = jnp.where(pos < j, mf[:, None], tj)
        code = code + tj * (4 ** j)
    return code


@functools.partial(
    jax.jit,
    static_argnames=("width", "b_pad", "n_rows", "mk_len", "ik_len"),
)
def _ov_prepare_device(tabs: dict, batch: dict, width: int, b_pad: int,
                       n_rows=None, trans9=None, mk_len=None, ik_len=None):
    """Device-side overlap input prep from the already-transferred narrow
    int batch arrays: banded x-side views via per-pair variable rolls,
    emission/insert resolution via small-table gathers.  Replaces the
    previous host-side assembly, whose [Ly, 16, B] f32 stream cost
    ~54 MB of host->device transfer per batch on a tunnelled TPU.

    Sequence-bank batches ("x_row" present) carry each distinct
    (sequence, strand) ONCE in bank_* arrays plus per-pair row indices —
    all-vs-all overlap would otherwise re-transfer every read per pair.

    Lane-packed batches carry seg_d_lo/seg_start/seg_width [B, S]
    descriptors (engine.PairBatch.build_packed layout: each envelope
    strip side by side on the lane axis with its ±1 halo) and an
    optional per-pair row offset "j_off" trimming the dead leading rows;
    legacy batches synthesize one segment spanning the band."""
    from .pallas_v2 import _lane_tables, _roll_rows_per_column, _cyclic_rows

    Q = QUAL_SCORE_RANGE
    use_ik = "lgo" in tabs
    x_ik = y_ik = None
    if "x_row" in batch:
        bik = None
        if "bank_mk" in batch:
            bt = batch["bank_tok"].astype(jnp.int32)
            bm = batch["bank_mk"].astype(jnp.int32)
            bqv = batch["bank_q"].astype(jnp.int32)
            bh = batch["bank_hq"]
            if use_ik:
                bik = batch["bank_ik"].astype(jnp.int32)
        else:
            # derived bank: only FORWARD base-read tokens/quals were
            # shipped ([N, L] + per-row valid length and most-frequent
            # token); k-mer contexts are computed here and row index
            # r >= N addresses row r-N REVERSED (the reverse-strand
            # arrays are exactly the forward arrays flipped —
            # overlap._y_strand_arrays).  Reversal = flip + per-row
            # cyclic roll by L - len; the wrapped tail lanes are masked
            # by the same x_len/y_len validity logic as zero padding.
            from .pallas_v2 import _roll_lanes_per_row as _rollL

            tok_f = batch["bank_tok"].astype(jnp.int32)  # [N, L]
            q_f = batch["bank_q"].astype(jnp.int32)
            hq_f = batch["bank_hq"]
            len_f = batch["bank_len"].astype(jnp.int32)
            mf = batch["bank_mf"].astype(jnp.int32)
            Lb = tok_f.shape[1]
            mk_f = _ctx_kmers_device(tok_f, mf, mk_len)
            rev_shift = Lb - len_f

            def _rev(a):
                return _rollL(jnp.flip(a, axis=1), rev_shift)

            bt = jnp.concatenate([tok_f, _rev(tok_f)], axis=0)
            bm = jnp.concatenate([mk_f, _rev(mk_f)], axis=0)
            bqv = jnp.concatenate([q_f, _rev(q_f)], axis=0)
            bh = jnp.concatenate([hq_f, hq_f], axis=0)
            if use_ik:
                ik_f = _ctx_kmers_device(tok_f, mf, ik_len)
                bik = jnp.concatenate([ik_f, _rev(ik_f)], axis=0)
        xr = batch["x_row"]
        yr = batch["y_row"]
        x_tok = jnp.take(bt, xr, axis=0)
        x_mk = jnp.take(bm, xr, axis=0)
        x_q = jnp.take(bqv, xr, axis=0)
        x_hq = jnp.take(bh, xr)
        y_mk = jnp.take(bm, yr, axis=0)
        y_tok = jnp.take(bt, yr, axis=0)
        y_q = jnp.take(bqv, yr, axis=0)
        y_hq = jnp.take(bh, yr)
        if use_ik:
            x_ik = jnp.take(bik, xr, axis=0)
            y_ik = jnp.take(bik, yr, axis=0)
    else:
        x_tok = batch["x_tok"].astype(jnp.int32)
        x_mk = batch["x_match_kmer"].astype(jnp.int32)
        x_q = batch["x_qual"].astype(jnp.int32)
        x_hq = batch["x_has_qual"]
        y_mk = batch["y_match_kmer"].astype(jnp.int32)
        y_tok = batch["y_tok"].astype(jnp.int32)
        y_q = batch["y_qual"].astype(jnp.int32)
        y_hq = batch["y_has_qual"]
        if use_ik:
            x_ik = batch["x_indel_kmer_pad"].astype(jnp.int32)[:, 1:]
            y_ik = batch["y_indel_kmer_pad"].astype(jnp.int32)[:, 1:]
    x_len = batch["x_len"].astype(jnp.int32)
    y_len = batch["y_len"].astype(jnp.int32)
    if "member_packed" in batch:
        # bit-packed lane mask (np.packbits axis=1 bitorder="little"):
        # the [B, W] bool mask is the dominant per-chunk host->device
        # transfer on the tunnelled runtime; unpack device-side
        mp = batch["member_packed"]
        bits = (mp[:, :, None] >> jnp.arange(8, dtype=mp.dtype)) & 1
        member = bits.reshape(mp.shape[0], mp.shape[1] * 8) > 0
    else:
        member = batch["member"]

    B, W0 = member.shape
    R = int(n_rows) if n_rows is not None else y_mk.shape[1]
    W, Bp = width, b_pad
    KmQ = tabs["msx2"].shape[0]
    Km = tabs["msxn2"].shape[0]

    if "seg_d_lo" in batch:
        seg_d_lo = batch["seg_d_lo"].astype(jnp.int32)
        seg_start = batch["seg_start"].astype(jnp.int32)
        seg_width = batch["seg_width"].astype(jnp.int32)
    else:
        d_lo = batch["d_lo"].astype(jnp.int32)
        zeros = jnp.zeros((B,), jnp.int32)
        seg_d_lo = d_lo[:, None]
        seg_start = zeros[:, None]
        seg_width = (zeros + W)[:, None]
    j_off = batch.get("j_off")
    if j_off is None:
        j_off = jnp.zeros((B,), jnp.int32)
    j_off = j_off.astype(jnp.int32)
    n_segs = seg_d_lo.shape[1]

    doff_f, snew_f, _sold, doff_i = _lane_tables(
        seg_d_lo, seg_start, seg_width, W, B, Bp
    )

    # combined per-x-position key: ((xkm*Q + xq)*4 + xtok), with the
    # indel kmer packed into the low digits at gap order > 0; one
    # variable roll then div/mod decode replaces per-array rolls
    Ki = int(tabs["lgo"].shape[0]) if use_ik else 1
    pk = (jnp.clip(x_mk, 0, Km - 1) * Q + jnp.clip(x_q, 0, Q - 1)) * 4 \
        + jnp.clip(x_tok, 0, 3)  # [B, Lx]
    if use_ik:
        pk = pk * Ki + jnp.clip(x_ik, 0, Ki - 1)
    log_rb = tabs["log_rb"]

    def x_values(pk_sel, hq):
        """Resolve the 4 match-given-ref values (+log ref base), the
        insert value, and (at gap order > 0) the gap open/stay logs from
        combined keys.  pk_sel [..., ], hq broadcast."""
        go = g1 = None
        if use_ik:
            ikv = pk_sel % Ki
            pk_sel = pk_sel // Ki
            go = jnp.take(tabs["lgo"], ikv)
            g1 = jnp.take(tabs["lg1m"], ikv)
        kmq = pk_sel // 4
        tok = pk_sel % 4
        km = kmq // Q
        v_q4 = jnp.take(tabs["msx2"], jnp.clip(kmq, 0, KmQ - 1), axis=0)
        v_n4 = jnp.take(tabs["msxn2"], jnp.clip(km, 0, Km - 1), axis=0)
        v4 = jnp.where(hq[..., None], v_q4, v_n4) + log_rb
        iq = jnp.take(tabs["ins2"], jnp.clip(kmq % Q + tok * Q, 0, 4 * Q - 1))
        inn = jnp.take(tabs["insn2"], tok)
        ins = jnp.where(hq, iq, inn)
        return v4, ins, go, g1

    # initial windows (row j_off+1's view): lane l of segment k holds the
    # x value at t0 = seg_d_lo + (l - seg_start) + j_off; banded index ->
    # per-segment lane roll
    lane_w = jnp.arange(W, dtype=jnp.int32)[None, :]
    pk0 = jnp.zeros((B, W), jnp.int32)
    for k in range(n_segs):
        start = seg_start[:, k][:, None]
        wk = seg_width[:, k][:, None]
        in_seg = (wk > 0) & (lane_w >= start) & (lane_w < start + wk)
        rolled = _cyclic_lanes(_roll_lanes_per_row(
            pk, seg_d_lo[:, k] - seg_start[:, k] + j_off
        ), W)
        pk0 = jnp.where(in_seg, rolled, pk0)
    t0 = doff_i + j_off[:, None]
    ok0 = (t0 >= 0) & (t0 < x_len[:, None])
    v4_0, ins_0, go_0, g1_0 = x_values(pk0, x_hq[:, None])
    a_init = [
        jnp.where(ok0, v4_0[..., r], NEG_INF) for r in range(ALPHABET_SIZE)
    ]
    c_init = jnp.where(ok0, ins_0, 0.0)
    if use_ik:
        # out-of-range gap values stay finite (0.0): every DP path that
        # would consume them is blocked by a -inf source term already
        go_init = jnp.where(ok0, go_0, 0.0)
        g1_init = jnp.where(ok0, g1_0, 0.0)

    # streamed incoming columns: segment k's last lane (diagonal d_last)
    # receives the value at t = d_last + j_off + r when advancing into
    # grid row r; banded index -> per-segment variable row roll
    rows_i = jnp.arange(R, dtype=jnp.int32)[:, None]  # [R, 1]
    pk_t = pk.T  # [Lx, B]
    new_chans = []
    for k in range(n_segs):
        d_last = seg_d_lo[:, k] + jnp.maximum(seg_width[:, k] - 1, 0) + j_off
        t_new = rows_i + d_last[None, :]
        ok_new = (
            (seg_width[None, :, k] > 0)
            & (t_new >= 0)
            & (t_new < x_len[None, :])
        )
        rk = _cyclic_rows(_roll_rows_per_column(pk_t, d_last), R)
        v4_k, ins_k, go_k, g1_k = x_values(rk, x_hq[None, :])
        for r in range(4):
            new_chans.append(jnp.where(ok_new, v4_k[..., r], NEG_INF))
        new_chans.append(jnp.where(ok_new, ins_k, 0.0))
        if use_ik:
            new_chans.append(jnp.where(ok_new, go_k, 0.0))
            new_chans.append(jnp.where(ok_new, g1_k, 0.0))

    # y-side per-row values at true rows j_off + 1 + r (strand fold baked
    # into msy2/msyn2): per-pair row roll of the y arrays
    def y_rows(a):
        return _cyclic_rows(_roll_rows_per_column(a.T, j_off), R)  # [R, B]

    ykm_r = y_rows(y_mk)
    ytok_r = y_rows(y_tok)
    yq_r = y_rows(y_q)
    key_y = jnp.clip(ykm_r * Q + yq_r, 0, KmQ - 1)
    msy4 = jnp.where(
        y_hq[None, :, None],
        jnp.take(tabs["msy2"], key_y, axis=0),
        jnp.take(tabs["msyn2"], jnp.clip(ykm_r, 0, Km - 1), axis=0),
    )  # [R, B, 4]
    insy = jnp.where(
        y_hq[None, :],
        jnp.take(tabs["ins2"], jnp.clip(ytok_r * Q + yq_r, 0, 4 * Q - 1)),
        jnp.take(tabs["insn2"], jnp.clip(ytok_r, 0, 3)),
    )

    def padB_rows(a):  # [R, B] -> [R, Bp]
        return jnp.pad(a.astype(jnp.float32), ((0, 0), (0, Bp - B)))

    channels = [padB_rows(msy4[..., r]) for r in range(4)]
    channels.append(padB_rows(insy))
    if use_ik:
        # y-side gap channels: open at the current row jf, stay at the
        # previous row jf-1 (jf=1 hits the reference's dummy entry 0 —
        # harmless, that path's source is -inf)
        yik_cur = y_rows(y_ik)
        yik_prev = y_rows(
            jnp.pad(y_ik[:, :-1], ((0, 0), (1, 0)))
        )
        goy = jnp.take(tabs["lgo"], jnp.clip(yik_cur, 0, Ki - 1))
        g1yp = jnp.take(tabs["lg1m"], jnp.clip(yik_prev, 0, Ki - 1))
        channels.append(padB_rows(goy))
        channels.append(padB_rows(g1yp))
    channels.extend(padB_rows(c) for c in new_chans)
    n_ch = NUM_CH_IK if use_ik else NUM_CH
    zeros_r = jnp.zeros((R, Bp), jnp.float32)
    rows = jnp.stack(
        channels + [zeros_r] * (n_ch - len(channels)), axis=1
    )

    def padW(a, fill):
        return jnp.full((Bp, W), fill, jnp.float32).at[:B].set(
            a[:, :W].astype(jnp.float32)
        )

    a0, a1, a2, a3 = (padW(a_init[k], NEG_INF) for k in range(4))
    c0 = padW(c_init, 0.0)
    go0 = padW(go_init, 0.0) if use_ik else None
    g10 = padW(g1_init, 0.0) if use_ik else None
    member_f = jnp.zeros((Bp, W), jnp.float32).at[:B, :W0].set(
        member.astype(jnp.float32)
    )
    meta = jnp.zeros((16, Bp), jnp.float32)
    meta = meta.at[1, :B].set(x_len.astype(jnp.float32))
    meta = meta.at[2, :B].set(y_len.astype(jnp.float32))
    meta = meta.at[3, :B].set(j_off.astype(jnp.float32))
    if trans9 is not None:
        meta = meta.at[4:13, :].set(
            jnp.broadcast_to(
                jnp.asarray(trans9, jnp.float32)[:, None], (9, Bp)
            )
        )
    return (rows, member_f, a0, a1, a2, a3, c0, meta, doff_f, snew_f,
            go0, g10)


def packed_overlap_descriptors(envs, x_lens, y_lens, max_segs: int = MAX_SEGS):
    """Lane-packed layout + live-row windows for a list of envelopes.

    Returns (member [B, Wp], seg_d_lo, seg_start, seg_width [B, S],
    j_off [B], max_rows): each envelope's strips (merged to <= max_segs)
    laid side by side on the lane axis with their ±1 halos, and the row
    window [j_off+1, j_off+rows] outside which the pair has no
    in-envelope cells (member diagonal d covers rows 1-d .. x_len-d)."""
    from ..envelope import pack_strips
    from .pallas_v2 import D_SENTINEL

    B = len(envs)
    seg_d_lo = np.full((B, max_segs), D_SENTINEL, np.int32)
    seg_start = np.zeros((B, max_segs), np.int32)
    seg_width = np.zeros((B, max_segs), np.int32)
    j_off = np.zeros(B, np.int32)
    rows = np.zeros(B, np.int32)
    masks = []
    for b, env in enumerate(envs):
        segs = pack_strips(env, max_segs)
        lane = 0
        parts = []
        for k, s in enumerate(segs):
            seg_d_lo[b, k] = s.band_lo
            seg_start[b, k] = lane
            seg_width[b, k] = s.band_width
            lane += s.band_width
            parts.append(s.member_mask())
        masks.append(np.concatenate(parts))
        d1 = int(segs[0].diagonals[0])
        d2 = int(segs[-1].diagonals[-1])
        j0 = max(1, 1 - d2)
        j_off[b] = j0 - 1
        rows[b] = max(min(int(y_lens[b]), int(x_lens[b]) - d1) - j0 + 1, 1)
    Wp = max(len(m) for m in masks)
    member = np.zeros((B, Wp), bool)
    for b, m in enumerate(masks):
        member[b, : len(m)] = m
    return member, seg_d_lo, seg_start, seg_width, j_off, int(rows.max())


@functools.partial(
    jax.jit,
    static_argnames=("width", "b_pad", "n_rows", "n_segs", "interpret",
                     "prep_rows", "mk_len", "ik_len"),
)
def _ov_scores_fused(tabs, batch, trans9, seg_start, seg_width, x_ins,
                     y_ins, *, width, b_pad, n_rows, n_segs, interpret,
                     prep_rows, mk_len=None, ik_len=None):
    """Prepare + fill + segment reduction in ONE jit: on a tunnelled
    device each separate dispatch costs a ~30 ms RTT, so the three-stage
    call sequence tripled the per-chunk latency of the all-vs-all
    scoring pass.  Returns the packed [B + B*n_segs] device array of
    _ov_reduce_segments WITHOUT fetching — callers drain after all
    chunks are enqueued."""
    pr = _ov_prepare_device(
        tabs, batch, width, b_pad,
        n_rows=n_rows if prep_rows else None, trans9=trans9,
        mk_len=mk_len, ik_len=ik_len,
    )
    (rows, member_f, a0, a1, a2, a3, c0, meta, doff, snew, go0, g10) = pr
    out = _ov_fill(
        rows, member_f, a0, a1, a2, a3, c0, meta, doff, snew,
        width=width, b_pad=b_pad, n_rows=n_rows, n_segs=n_segs,
        interpret=interpret, go0=go0, g10=g10,
    )
    B = seg_start.shape[0]
    return _ov_reduce_segments(n_segs, out[:B], seg_start, seg_width,
                               x_ins, y_ins)


@functools.partial(jax.jit, static_argnums=(0,))
def _ov_reduce_segments(n_segs, out, seg_start, seg_width, x_ins, y_ins):
    """Per-pair end score + per-segment end maxima from the [B, W]
    per-lane end accumulator.  Lane-packed strips are independent DP
    subproblems whose lanes never mix (halo lanes block the in-row
    recursion at seams), so the max over segment k's lane range is that
    strip's end score."""
    lane = jnp.arange(out.shape[1], dtype=jnp.int32)[None, None, :]
    lo = seg_start.astype(jnp.int32)[:, :, None]
    hi = lo + seg_width.astype(jnp.int32)[:, :, None]
    in_seg = (lane >= lo) & (lane < hi)
    segmax = jnp.max(
        jnp.where(in_seg, out[:, None, :], NEG_INF), axis=2
    )
    segmax = jnp.where(segmax <= NEG_INF / 2, -jnp.inf, segmax)
    end = jnp.max(out, axis=1)
    end = jnp.where(end <= NEG_INF / 2, -jnp.inf, end)
    # one fetch on tunnelled devices: scores then row-major segment maxima
    return jnp.concatenate([end + x_ins + y_ins, segmax.ravel()])


def overlap_scores_kernel(tables, batch, interpret: bool = False,
                          n_rows: int = None, return_segments: bool = False,
                          defer_fetch: bool = False):
    """Overlap end scores [B] for an overlap batch (OverlapBatch.device()
    dict, or a sequence-bank dict with x_row/y_row indices — then n_rows
    gives the padded row count).  Lane-packed batches additionally carry
    seg_* descriptors and an optional per-pair "j_off" row offset (the
    live rows of pair b are j_off[b]+1 .. j_off[b]+n_rows).  Requires
    gap order 0.  Returns end + x/y insert scores, i.e. the same
    quantity as dp.overlap.overlap_fill's 'score'.  With
    return_segments=True (lane-packed batches only) also returns the
    per-strip raw end maxima [B, S] — insert scores NOT added, so they
    rank strips within a pair, matching pack_strips order.  With
    defer_fetch=True (return_segments only) the UNFETCHED packed device
    array [B + B*S] is returned instead (scores then row-major segment
    maxima): callers dispatching many chunks through a tunnelled device
    drain them all after the last enqueue rather than paying one RTT
    per chunk."""
    # the process's first dispatch pays the axon server-side kernel
    # recompile (seconds); the small-workload native gate keys off this
    global KERNEL_WARM
    KERNEL_WARM = True
    if "member_packed" in batch:
        B, W8 = batch["member_packed"].shape
        W0 = W8 * 8
    else:
        B, W0 = np.asarray(batch["member"]).shape
    Ly = (
        int(n_rows) if n_rows is not None
        else int(np.asarray(batch["y_match_kmer"]).shape[1])
    )
    W = _round_up(max(W0, 128), 128)
    Bp = _round_up(B, 8)
    n_segs = (
        int(np.asarray(batch["seg_d_lo"]).shape[1])
        if "seg_d_lo" in batch
        else 1
    )

    trans9 = jnp.asarray(
        [
            float(tables.m2m[0, 0]),
            float(tables.m2i[0, 0]),
            float(tables.m2d[0, 0]),
            tables.i2m_eff,
            tables.i2i_eff,
            tables.i2d_eff,
            tables.d2m_eff,
            tables.d2i_eff,
            tables.d2d_eff,
        ],
        jnp.float32,
    )
    prep_rows = "x_row" in batch or "j_off" in batch
    if return_segments:
        if "seg_d_lo" not in batch:
            raise ValueError("return_segments needs a lane-packed batch")
        packed_dev = _ov_scores_fused(
            _ov_tabs(tables), batch, trans9,
            jnp.asarray(batch["seg_start"]),
            jnp.asarray(batch["seg_width"]),
            jnp.asarray(batch["x_insert_score"], jnp.float32),
            jnp.asarray(batch["y_insert_score"], jnp.float32),
            width=W, b_pad=Bp, n_rows=Ly, n_segs=n_segs,
            interpret=interpret, prep_rows=prep_rows,
            mk_len=tables.match_kmer_len, ik_len=tables.indel_kmer_len,
        )
        if defer_fetch:
            return packed_dev
        packed = np.asarray(packed_dev, dtype=np.float64)
        return packed[:B], packed[B:].reshape(B, n_segs)

    (rows, member_f, a0, a1, a2, a3, c0, meta, doff, snew, go0, g10) = (
        _ov_prepare_device(
            _ov_tabs(tables), batch, W, Bp,
            n_rows=Ly if prep_rows else None,
            trans9=trans9,
            mk_len=tables.match_kmer_len, ik_len=tables.indel_kmer_len,
        )
    )

    out = _ov_fill(
        rows, member_f, a0, a1, a2, a3, c0, meta, doff, snew,
        width=W, b_pad=Bp, n_rows=Ly, n_segs=n_segs,
        interpret=interpret, go0=go0, g10=g10,
    )
    end = jnp.max(out[:B], axis=1)
    end = jnp.where(end <= NEG_INF / 2, -jnp.inf, end)
    return end + jnp.asarray(batch["x_insert_score"], jnp.float32) + jnp.asarray(
        batch["y_insert_score"], jnp.float32
    )
