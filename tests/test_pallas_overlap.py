"""Pallas overlap kernel equivalence tests (interpreter mode).

The kernel recomputes pair emissions with exact log-sum-exp while the XLA
path uses the reference's truncated tables, so scores agree to ~1e-5 per
column (the truncation magnitude) rather than exactly.
"""

import numpy as np
import pytest

from quaff_tpu.alphabet import DNA_ALPHABET
from quaff_tpu.dp.overlap import OverlapScoreTables, overlap_device_tables, overlap_fill
from quaff_tpu.dp.pallas_overlap import overlap_scores_kernel
from quaff_tpu.envelope import sparse_envelope
from quaff_tpu.io.fastseq import FastSeq, KmerIndex
from quaff_tpu.model.params import default_params
from quaff_tpu.overlap import OverlapBatch

import jax.numpy as jnp


def _make_params(gap_order=0):
    """Default params, optionally lifted to a non-trivial gap order:
    per-indel-kmer begin probabilities spread around the scalar defaults
    so the position-dependent m2m/m2i/m2d transitions actually vary."""
    params = default_params()
    if gap_order == 0:
        return params
    import copy

    p = copy.deepcopy(params)
    p.indel_kmer_len = gap_order
    ki = 4 ** gap_order
    bi = float(np.atleast_1d(params.begin_insert)[0])
    bd = float(np.atleast_1d(params.begin_delete)[0])
    rng = np.random.default_rng(7)
    p.begin_insert = np.clip(bi * rng.uniform(0.5, 2.0, ki), 1e-4, 0.4)
    p.begin_delete = np.clip(bd * rng.uniform(0.5, 2.0, ki), 1e-4, 0.4)
    return p


def _read_pairs(rng, n, y_comp=False):
    pairs = []
    for b in range(n):
        xl = int(rng.integers(150, 240))
        xs = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, xl))
        yl = int(rng.integers(100, 140))
        start = int(rng.integers(0, xl - yl))
        ys = list(xs[start : start + yl])
        for i in range(len(ys)):
            if rng.random() < 0.1:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        x = FastSeq(
            name=f"x{b}", seq=xs,
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, xl)),
        )
        y = FastSeq(
            name=f"y{b}", seq="".join(ys),
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl)),
        )
        if y_comp:
            y = y.revcomp()
            y.name = f"y{b}rc"
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
        pairs.append((x, y, env))
    return pairs


@pytest.mark.parametrize("gap_order", [0, 1])
@pytest.mark.parametrize("y_comp", [False, True])
def test_overlap_kernel_matches_xla(y_comp, gap_order):
    rng = np.random.default_rng(13)
    params = _make_params(gap_order)
    tables = OverlapScoreTables.from_params(params, y_comp)
    pairs = _read_pairs(rng, 4, y_comp)
    batch = OverlapBatch(pairs, tables)
    bdev = batch.device()
    ref = np.asarray(
        overlap_fill(
            overlap_device_tables(tables), bdev,
            return_matrices=False, dtype=jnp.float64,
        )["score"]
    )
    got = np.asarray(overlap_scores_kernel(tables, bdev, interpret=True))
    # truncated-lse tables vs exact lse: ~1e-5 * aligned columns
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=0.05)


@pytest.mark.parametrize("gap_order", [0, 1])
@pytest.mark.parametrize("y_comp", [False, True])
def test_overlap_kernel_packed_trimmed(y_comp, gap_order):
    """Lane-packed strips + live-row trimming must score identically to
    the full bounding-band kernel batch (which itself matches XLA)."""
    from quaff_tpu.dp.pallas_overlap import packed_overlap_descriptors
    from quaff_tpu.dp.pallas_v2 import _round_up

    rng = np.random.default_rng(23)
    params = _make_params(gap_order)
    tables = OverlapScoreTables.from_params(params, y_comp)

    # overlaps on diagonals far from 0 -> multi-strip envelopes with a
    # dead leading-row region
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1400))
    pairs = []
    for b in range(4):
        xl = int(rng.integers(500, 700))
        x0 = int(rng.integers(0, 200))
        yl = int(rng.integers(300, 400))
        y0 = int(rng.integers(600, 900))
        xs = base[x0 : x0 + xl]
        ys = list(base[y0 : y0 + yl])
        for i in range(len(ys)):
            if rng.random() < 0.08:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        x = FastSeq(
            name=f"x{b}", seq=xs,
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, xl)),
        )
        # stored copy forward-matches x (production: x overlaps the
        # original's minus strand, so its revcomp copy matches forward);
        # y_comp only selects the strand-folded tables
        y = FastSeq(
            name=f"y{b}", seq="".join(ys),
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl)),
        )
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
        pairs.append((x, y, env))
    assert any(len(e.strips()) > 1 for *_, e in pairs)

    batch = OverlapBatch(pairs, tables)
    want = np.asarray(
        overlap_scores_kernel(tables, batch.device(), interpret=True),
        dtype=np.float64,
    )

    member, seg_d_lo, seg_start, seg_width, j_off, rows = (
        packed_overlap_descriptors(
            [e for *_, e in pairs],
            [len(x.seq) for x, _, _ in pairs],
            [len(y.seq) for _, y, _ in pairs],
        )
    )
    assert member.shape[1] < max(e.band_width for *_, e in pairs)
    d = dict(batch.device())
    d["member"] = jnp.asarray(member)
    d["seg_d_lo"] = jnp.asarray(seg_d_lo)
    d["seg_start"] = jnp.asarray(seg_start)
    d["seg_width"] = jnp.asarray(seg_width)
    d["j_off"] = jnp.asarray(j_off)
    got = np.asarray(
        overlap_scores_kernel(
            tables, d, interpret=True,
            n_rows=_round_up(max(rows, 1), 256),
        ),
        dtype=np.float64,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_overlap_kernel_segment_scores():
    """return_segments must expose each lane-packed strip's end maximum
    (pack_strips order): strip k's segment max + the pair's insert
    scores equals the exact f64 fill of that strip alone, and the
    per-pair score is the max over strips."""
    from quaff_tpu.dp.pallas_overlap import (
        MAX_SEGS,
        packed_overlap_descriptors,
    )
    from quaff_tpu.dp.pallas_v2 import _round_up
    from quaff_tpu.envelope import pack_strips
    from quaff_tpu.overlap import OverlapBatch

    rng = np.random.default_rng(23)
    params = default_params()
    tables = OverlapScoreTables.from_params(params, False)
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 1400))
    pairs = []
    for b in range(4):
        xl = int(rng.integers(500, 700))
        x0 = int(rng.integers(0, 200))
        yl = int(rng.integers(300, 400))
        y0 = int(rng.integers(600, 900))
        xs = base[x0 : x0 + xl]
        ys = list(base[y0 : y0 + yl])
        for i in range(len(ys)):
            if rng.random() < 0.08:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        x = FastSeq(
            name=f"x{b}", seq=xs,
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, xl)),
        )
        y = FastSeq(
            name=f"y{b}", seq="".join(ys),
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl)),
        )
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
        pairs.append((x, y, env))
    assert any(len(pack_strips(e, MAX_SEGS)) > 1 for *_, e in pairs)

    batch = OverlapBatch(pairs, tables)
    member, seg_d_lo, seg_start, seg_width, j_off, rows = (
        packed_overlap_descriptors(
            [e for *_, e in pairs],
            [len(x.seq) for x, _, _ in pairs],
            [len(y.seq) for _, y, _ in pairs],
        )
    )
    d = dict(batch.device())
    d["member"] = jnp.asarray(member)
    d["seg_d_lo"] = jnp.asarray(seg_d_lo)
    d["seg_start"] = jnp.asarray(seg_start)
    d["seg_width"] = jnp.asarray(seg_width)
    d["j_off"] = jnp.asarray(j_off)
    score_dev, seg_dev = overlap_scores_kernel(
        tables, d, interpret=True,
        n_rows=_round_up(max(rows, 1), 256), return_segments=True,
    )
    score = np.asarray(score_dev, np.float64)
    segmax = np.asarray(seg_dev, np.float64)

    tdev = overlap_device_tables(tables)
    for b, (x, y, env) in enumerate(pairs):
        segs = pack_strips(env, MAX_SEGS)
        ins = float(batch.x_insert_score[b] + batch.y_insert_score[b])
        for k, s in enumerate(segs):
            ref = float(
                np.asarray(
                    overlap_fill(
                        tdev, OverlapBatch([(x, y, s)], tables).device(),
                        return_matrices=False, dtype=jnp.float64,
                    )["end"]
                )[0]
            )
            got = segmax[b, k]
            if not np.isfinite(ref):
                assert not np.isfinite(got)
            else:
                np.testing.assert_allclose(got, ref, rtol=1e-5, atol=0.05)
        # unused segment slots report -inf
        for k in range(len(segs), segmax.shape[1]):
            assert not np.isfinite(segmax[b, k])
        np.testing.assert_allclose(
            score[b], np.max(segmax[b]) + ins, rtol=1e-6, atol=1e-4
        )


@pytest.mark.parametrize("gap_order", [0, 1])
@pytest.mark.parametrize("y_comp", [False, True])
def test_overlap_kernel_bank_path(y_comp, gap_order):
    """The sequence-bank batch form (unique rows + per-pair indices) must
    score identically to the per-pair OverlapBatch form."""
    from quaff_tpu.dp.engine import _narrow_int
    from quaff_tpu.overlap import _y_strand_arrays, _insert_score_sum

    rng = np.random.default_rng(41)
    params = _make_params(gap_order)
    tables = OverlapScoreTables.from_params(params, y_comp)
    pairs = _read_pairs(rng, 4, y_comp=y_comp)

    batch = OverlapBatch(pairs, tables)
    want = np.asarray(
        overlap_scores_kernel(tables, batch.device(), interpret=True),
        dtype=np.float64,
    )

    # bank: unique sequences (each pair has distinct seqs here; repeat one
    # row on purpose by listing both sides)
    def round_up(v, m):
        return ((v + m - 1) // m) * m

    seqs, rows = [], {}
    for x, y, _ in pairs:
        for s, comp in ((x, False), (y, y_comp)):
            key = (s.name, comp)
            if key not in rows:
                rows[key] = len(seqs)
                seqs.append((s, comp))
    Lmax = round_up(max(len(s.seq) for s, _ in seqs), 512)
    NB = len(seqs)
    b_tok = np.zeros((NB, Lmax), np.int32)
    b_mk = np.zeros((NB, Lmax), np.int32)
    b_ik = np.zeros((NB, Lmax), np.int32)
    b_q = np.zeros((NB, Lmax), np.int32)
    b_hq = np.zeros(NB, bool)
    for r, (s, comp) in enumerate(seqs):
        tabs_rc = OverlapScoreTables.from_params(params, comp)
        tok, mk, ik, q = _y_strand_arrays(s, tabs_rc)
        n = len(tok)
        b_tok[r, :n] = tok
        b_mk[r, :n] = mk
        b_ik[r, :n] = ik
        if q is not None:
            b_q[r, :n] = q
            b_hq[r] = True
    lp = round_up(max(len(y.seq) for _, y, _ in pairs), 512)
    wp = round_up(max(e.band_width for _, _, e in pairs), 128)
    B = len(pairs)
    member = np.zeros((B, wp), bool)
    d_lo = np.zeros(B, np.int32)
    for b, (_, _, env) in enumerate(pairs):
        mask = env.member_mask()
        member[b, : len(mask)] = mask
        d_lo[b] = env.band_lo
    d = {
        "bank_tok": _narrow_int(b_tok, 4),
        "bank_mk": _narrow_int(b_mk, 4 ** max(tables.match_kmer_len, 1)),
        "bank_q": _narrow_int(b_q, 94),
        "bank_hq": jnp.asarray(b_hq),
        **(
            {"bank_ik": _narrow_int(b_ik, 4 ** gap_order)}
            if gap_order
            else {}
        ),
        "x_row": jnp.asarray(
            [rows[(x.name, False)] for x, _, _ in pairs], jnp.int32
        ),
        "y_row": jnp.asarray(
            [rows[(y.name, y_comp)] for _, y, _ in pairs], jnp.int32
        ),
        "x_len": jnp.asarray([len(x.seq) for x, _, _ in pairs], jnp.int32),
        "y_len": jnp.asarray([len(y.seq) for _, y, _ in pairs], jnp.int32),
        "d_lo": jnp.asarray(d_lo),
        "member": jnp.asarray(member),
        "x_insert_score": jnp.asarray(
            [
                _insert_score_sum(
                    tables, *(lambda t, m, i, q: (t, q))(*_y_strand_arrays(
                        x, OverlapScoreTables.from_params(params, False)
                    ))
                )
                for x, _, _ in pairs
            ]
        ),
        "y_insert_score": jnp.asarray(
            [
                _insert_score_sum(
                    tables, *(lambda t, m, i, q: (t, q))(*_y_strand_arrays(
                        y, OverlapScoreTables.from_params(params, y_comp)
                    ))
                )
                for _, y, _ in pairs
            ]
        ),
    }
    got = np.asarray(
        overlap_scores_kernel(tables, d, interpret=True, n_rows=lp),
        dtype=np.float64,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("gap_order", [0, 1])
@pytest.mark.parametrize("y_comp", [False, True])
def test_overlap_kernel_derived_bank(y_comp, gap_order):
    """The derived-bank batch form (forward base tokens/quals only;
    k-mer contexts and reverse-strand rows computed on device, row id
    r + N = bank row r reversed) must score identically to the per-pair
    OverlapBatch form."""
    from quaff_tpu.dp.engine import _narrow_int
    from quaff_tpu.overlap import _y_strand_arrays, _insert_score_sum

    rng = np.random.default_rng(43)
    params = _make_params(gap_order)
    tables = OverlapScoreTables.from_params(params, y_comp)
    pairs = _read_pairs(rng, 4, y_comp=y_comp)

    batch = OverlapBatch(pairs, tables)
    want = np.asarray(
        overlap_scores_kernel(tables, batch.device(), interpret=True),
        dtype=np.float64,
    )

    def round_up(v, m):
        return ((v + m - 1) // m) * m

    # one bank row per distinct FORWARD base read: x sides as-is, y sides
    # via revcomp when complemented (the device flips them back)
    bases, rows = [], {}
    for x, y, _ in pairs:
        for s, comp in ((x, False), (y, y_comp)):
            key = (s.name, comp)
            if key not in rows:
                rows[key] = (len(bases), comp)
                bases.append(s.revcomp() if comp else s)
    Lmax = round_up(max(len(s.seq) for s in bases), 512)
    NB = len(bases)
    b_tok = np.zeros((NB, Lmax), np.int32)
    b_q = np.zeros((NB, Lmax), np.int32)
    b_hq = np.zeros(NB, bool)
    b_len = np.zeros(NB, np.int32)
    b_mf = np.zeros(NB, np.int32)
    for r, s in enumerate(bases):
        tok = s.tokens()
        b_tok[r, : len(tok)] = tok
        b_len[r] = len(tok)
        b_mf[r] = int(np.argmax(np.bincount(tok, minlength=4)))
        if s.has_qual():
            b_q[r, : len(tok)] = s.qual_scores()
            b_hq[r] = True
    lp = round_up(max(len(y.seq) for _, y, _ in pairs), 512)
    wp = round_up(max(e.band_width for _, _, e in pairs), 128)
    B = len(pairs)
    member = np.zeros((B, wp), bool)
    d_lo = np.zeros(B, np.int32)
    for b, (_, _, env) in enumerate(pairs):
        mask = env.member_mask()
        member[b, : len(mask)] = mask
        d_lo[b] = env.band_lo

    def row_id(key):
        r, comp = rows[key]
        return r + (NB if comp else 0)

    d = {
        "bank_tok": _narrow_int(b_tok, 4),
        "bank_q": _narrow_int(b_q, 94),
        "bank_hq": jnp.asarray(b_hq),
        "bank_len": jnp.asarray(b_len),
        "bank_mf": _narrow_int(b_mf, 4),
        "x_row": jnp.asarray(
            [row_id((x.name, False)) for x, _, _ in pairs], jnp.int32
        ),
        "y_row": jnp.asarray(
            [row_id((y.name, y_comp)) for _, y, _ in pairs], jnp.int32
        ),
        "x_len": jnp.asarray([len(x.seq) for x, _, _ in pairs], jnp.int32),
        "y_len": jnp.asarray([len(y.seq) for _, y, _ in pairs], jnp.int32),
        "d_lo": jnp.asarray(d_lo),
        "member": jnp.asarray(member),
        "x_insert_score": jnp.asarray(
            [
                _insert_score_sum(
                    tables, *(lambda t, m, i, q: (t, q))(*_y_strand_arrays(
                        x, OverlapScoreTables.from_params(params, False)
                    ))
                )
                for x, _, _ in pairs
            ]
        ),
        "y_insert_score": jnp.asarray(
            [
                _insert_score_sum(
                    tables, *(lambda t, m, i, q: (t, q))(*_y_strand_arrays(
                        y, OverlapScoreTables.from_params(params, y_comp)
                    ))
                )
                for _, y, _ in pairs
            ]
        ),
    }
    got = np.asarray(
        overlap_scores_kernel(tables, d, interpret=True, n_rows=lp),
        dtype=np.float64,
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("gap_order", [0, 1])
def test_overlap_pipeline_fast_path_matches_sequential(gap_order, monkeypatch):
    """The all-vs-all TPU fast path (kernel scoring + pruned exact fills,
    overlap.QuaffOverlapAligner._align_all_batched) must produce the
    byte-identical Stockholm text of the sequential XLA path — exercised
    on the CPU backend via QUAFF_OV_INTERPRET=1."""
    import io

    from quaff_tpu.aligner import DPConfig
    from quaff_tpu.formats.alignment import AlignmentPrinter
    from quaff_tpu.io.fastseq import add_revcomps
    from quaff_tpu.model.params import QuaffNullParams
    from quaff_tpu.overlap import QuaffOverlapAligner

    rng = np.random.default_rng(5)
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 600))
    reads = []
    for i in range(4):
        s0 = int(rng.integers(0, 200))
        ln = int(rng.integers(250, 350))
        s = list(base[s0 : s0 + ln])
        for p in range(len(s)):
            if rng.random() < 0.05:
                s[p] = "acgt"[int(rng.integers(0, 4))]
        reads.append(
            FastSeq(
                name=f"r{i}", seq="".join(s),
                qual="".join(
                    chr(33 + int(q)) for q in rng.integers(3, 40, len(s))
                ),
            )
        )
    params = _make_params(gap_order)
    null = QuaffNullParams.fit(reads)
    config = DPConfig()
    printer = AlignmentPrinter()
    printer.log_odds_threshold = float("-inf")
    seqs = add_revcomps(reads)

    ov = QuaffOverlapAligner(params, null, config)
    want = io.StringIO()
    ov.align_all(want, seqs, len(reads), printer)
    assert want.getvalue().count("# STOCKHOLM")

    monkeypatch.setenv("QUAFF_OV_INTERPRET", "1")
    monkeypatch.setattr(
        QuaffOverlapAligner, "_use_fast_scores", lambda self: True
    )
    ov2 = QuaffOverlapAligner(params, null, config)
    got = io.StringIO()
    ov2.align_all(got, seqs, len(reads), printer)
    assert got.getvalue() == want.getvalue()
