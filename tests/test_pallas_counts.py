"""Pallas E-step kernel equivalence tests (interpreter mode).

The fused forward-store + backward-counts kernels must reproduce the XLA
forward-backward engine's posterior-weighted count totals.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quaff_tpu.alphabet import DNA_ALPHABET
from quaff_tpu.dp.counts import dp_forward_backward
from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables
from quaff_tpu.dp.pallas_counts import estep_kernel
from quaff_tpu.dp.pallas_v2 import V2Tables
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import sparse_envelope
from quaff_tpu.io.fastseq import FastSeq, KmerIndex
from quaff_tpu.model.params import default_params


def _pairs(rng, n):
    out = []
    for b in range(n):
        xl = int(rng.integers(150, 240))
        yl = int(rng.integers(90, 140))
        xs = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, xl))
        start = int(rng.integers(0, xl - yl))
        ys = list(xs[start : start + yl])
        for i in range(len(ys)):
            if rng.random() < 0.08:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        y = FastSeq(
            name=f"y{b}",
            seq="".join(ys),
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl)),
        )
        x = FastSeq(name=f"x{b}", seq=xs)
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
        out.append((x, y, env))
    return out


def test_estep_kernel_matches_engine():
    rng = np.random.default_rng(9)
    tables = ScoreTables.from_params(default_params())
    pairs = _pairs(rng, 4)
    bdev = device_batch(PairBatch.build(pairs, tables))
    tdev = device_tables(tables)

    ref = dp_forward_backward(
        tdev, bdev, local=True, dtype=jnp.float64,
        num_match_kmers=4, num_indel_kmers=1,
    )
    fwd_ref = np.asarray(ref["fwd_score"])
    weights = np.array([1.0, 0.5, 2.0, 0.25])

    v2tab = V2Tables(tables)
    fwd, counts = estep_kernel(
        tables, v2tab, bdev, weights, fwd_ref, local=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fwd), fwd_ref, rtol=1e-5, atol=1e-3)

    # weighted totals across pairs
    for name, ref_name in [
        ("match_counts", "match_counts"),
        ("insert_counts", "insert_counts"),
        ("m2m", "m2m"),
        ("m2i", "m2i"),
        ("m2d", "m2d"),
        ("m2e", "m2e"),
    ]:
        want = np.tensordot(weights, np.asarray(ref[ref_name]), axes=(0, 0))
        got = np.asarray(counts[name])
        # f32 kernel accumulation vs f64 engine: ~1e-3 relative noise
        np.testing.assert_allclose(
            got, want, rtol=3e-3, atol=5e-3, err_msg=name
        )
    for name in ("i2i", "i2m", "d2d", "d2m"):
        want = weights * np.asarray(ref[name])
        np.testing.assert_allclose(
            np.asarray(counts[name]), want, rtol=3e-3, atol=5e-3, err_msg=name
        )
    # backward-pass self check: posterior start mass ~ exp(back - fwd) ~ 1
    # (f32 forward/backward round-trip over ~6k rows)
    np.testing.assert_allclose(
        np.asarray(counts["back_start_post"]), 1.0, rtol=5e-3
    )


def test_estep_fused_matches_engine():
    """The single-dispatch fused E-step (device-computed posterior
    weights) must match the engine's posterior-weighted totals."""
    from quaff_tpu.dp.pallas_counts import estep_fused

    rng = np.random.default_rng(11)
    tables = ScoreTables.from_params(default_params())
    pairs = _pairs(rng, 4)
    bdev = device_batch(PairBatch.build(pairs, tables))
    tdev = device_tables(tables)

    ref = dp_forward_backward(
        tdev, bdev, local=True, dtype=jnp.float64,
        num_match_kmers=4, num_indel_kmers=1,
    )
    fwd_ref = np.asarray(ref["fwd_score"])
    null_ll = float(np.max(fwd_ref))  # comparable magnitude -> mixed weights
    y_ll_ref = np.logaddexp.reduce(np.concatenate([[null_ll], fwd_ref]))
    weights = np.exp(fwd_ref - y_ll_ref)

    v2tab = V2Tables(tables)
    fwd, y_ll, counts = estep_fused(
        tables, v2tab, bdev, null_ll, local=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fwd), fwd_ref, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(float(np.asarray(y_ll).reshape(-1)[0]), y_ll_ref, rtol=1e-5, atol=1e-3)

    for name in ("match_counts", "insert_counts", "m2m", "m2i", "m2d", "m2e"):
        want = np.tensordot(weights, np.asarray(ref[name]), axes=(0, 0))
        np.testing.assert_allclose(
            np.asarray(counts[name]), want, rtol=3e-3, atol=5e-3, err_msg=name
        )
    for name in ("i2i", "i2m", "d2d", "d2m"):
        want = weights * np.asarray(ref[name])
        np.testing.assert_allclose(
            np.asarray(counts[name]), want, rtol=3e-3, atol=5e-3, err_msg=name
        )


def test_estep_fused_multi_reads():
    """Pairs from several reads in one dispatch: per-read device weights
    and batch-summed counts must equal the engine's per-read posterior
    sums."""
    from quaff_tpu.dp.pallas_counts import estep_fused_multi

    rng = np.random.default_rng(31)
    tables = ScoreTables.from_params(default_params())
    pairs = _pairs(rng, 6)  # entries 0-2 = read group 0, 3-5 = group 1
    gid = np.array([0, 0, 0, 1, 1, 1], np.int32)
    bdev = device_batch(PairBatch.build(pairs, tables))
    tdev = device_tables(tables)

    ref = dp_forward_backward(
        tdev, bdev, local=True, dtype=jnp.float64,
        num_match_kmers=4, num_indel_kmers=1,
    )
    fwd_ref = np.asarray(ref["fwd_score"])
    null_lls = np.array([fwd_ref[:3].max(), fwd_ref[3:].max() - 1.0])
    y_ll_ref = np.array([
        np.logaddexp.reduce(np.concatenate([[null_lls[g]], fwd_ref[gid == g]]))
        for g in range(2)
    ])
    weights = np.exp(fwd_ref - y_ll_ref[gid])

    v2tab = V2Tables(tables)
    fwd, y_ll, counts = estep_fused_multi(
        tables, v2tab, bdev, gid, null_lls, local=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fwd), fwd_ref, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(y_ll), y_ll_ref, rtol=1e-5, atol=1e-3)
    for name in ("match_counts", "insert_counts", "m2m", "m2i", "m2d", "m2e"):
        want = np.tensordot(weights, np.asarray(ref[name]), axes=(0, 0))
        np.testing.assert_allclose(
            np.asarray(counts[name]), want, rtol=3e-3, atol=5e-3, err_msg=name
        )
    for name in ("i2i", "i2m", "d2d", "d2m"):
        want = weights * np.asarray(ref[name])
        np.testing.assert_allclose(
            np.asarray(counts[name]), want, rtol=3e-3, atol=5e-3, err_msg=name
        )


def test_counts_kernel_batched_chunking_matches_exact():
    """The TPU batched E-step driver (greedy whole-read chunking, mixed
    read lengths, power-of-two batch padding with the zero-weight
    sentinel group) must reproduce the exact per-read engine path's
    totals, log-likelihood and ref orderings.  Runs the Pallas kernels
    in interpreter mode so the full production driver is exercised on
    CPU."""
    from quaff_tpu.aligner import DPConfig
    from quaff_tpu.dp import pallas_counts as pc
    from quaff_tpu.io.fastseq import FastSeq
    from quaff_tpu.model.params import QuaffNullParams
    from quaff_tpu.trainer import QuaffCounter

    rng = np.random.default_rng(31)
    base = "".join("acgt"[t] for t in rng.integers(0, 4, 2200))
    refs = [
        FastSeq(name="refA", seq=base[:1600]),
        FastSeq(name="refB", seq=base[400:2200]),
    ]
    reads = []
    for i, (s0, ln) in enumerate(
        [(100, 600), (300, 1100), (700, 800), (900, 500)]
    ):
        seq = list(base[s0 : s0 + ln])
        for _ in range(int(ln * 0.06)):
            p = int(rng.integers(0, ln))
            seq[p] = "acgt"[int(rng.integers(0, 4))]
        reads.append(
            FastSeq(
                name=f"r{i}", seq="".join(seq),
                qual="".join(
                    chr(33 + int(q)) for q in rng.integers(3, 40, ln)
                ),
            )
        )
    null = QuaffNullParams.fit(reads)
    params = default_params()
    config = DPConfig()
    sort_order = [list(range(len(refs))) for _ in reads]

    exact = QuaffCounter(params, null, config, True)
    want_counts, want_ll, want_so = exact.get_counts(refs, reads, sort_order)

    orig = pc.estep_fused_multi
    calls = []

    def fused_interp(tables, v2tab, batch, gid, null_lls, local=True):
        calls.append(int(np.asarray(batch["member"]).shape[0]))
        return orig(tables, v2tab, batch, gid, null_lls,
                    local=local, interpret=True)

    kern = QuaffCounter(params, null, config, True)
    kern._use_kernel = lambda y: True
    pc.estep_fused_multi = fused_interp
    try:
        got_counts, got_ll, got_so = kern._get_counts_kernel_batched(
            refs, reads, sort_order, type(
                "P", (), {"log_progress": lambda *a, **k: None}
            )()
        )
    finally:
        pc.estep_fused_multi = orig

    assert calls, "kernel path not exercised"
    assert all(b in (8, 16, 32, 64, 128, 256) for b in calls), calls
    assert got_so == want_so
    np.testing.assert_allclose(got_ll, want_ll, rtol=1e-5)
    import io

    a, b = io.StringIO(), io.StringIO()
    want_counts.write_json(a)
    got_counts.write_json(b)
    wt = np.array(
        [float(x) for x in a.getvalue().replace(",", " ").split()
         if x.replace(".", "").replace("-", "").replace("e", "")
         .replace("+", "").isdigit()]
    )
    gt = np.array(
        [float(x) for x in b.getvalue().replace(",", " ").split()
         if x.replace(".", "").replace("-", "").replace("e", "")
         .replace("+", "").isdigit()]
    )
    assert wt.shape == gt.shape
    np.testing.assert_allclose(gt, wt, rtol=5e-3, atol=5e-3)


def test_estep_kernel_gap_order1_matches_engine():
    """The n_ik > 1 path (per-row one-hot transition lookup + the
    transposed d_ik accumulation dots) must match the engine at gap
    order 1 — the default-order tests only exercise the single-context
    fast path."""
    from quaff_tpu.model.params import QuaffNullParams, QuaffParamCounts

    rng = np.random.default_rng(19)
    pairs = _pairs(rng, 4)
    null = QuaffNullParams.fit([y for _, y, _ in pairs])
    pc = QuaffParamCounts.zero(1, 1)  # match order 1, gap order 1
    pc.init_counts(9, 9, 5, 1, null)
    params = pc.fit()
    assert params.indel_kmer_len == 1 and params.num_indel_kmers == 4
    tables = ScoreTables.from_params(params)
    # rebuild envelopes irrelevant (sequence-only); reuse pairs
    bdev = device_batch(PairBatch.build(pairs, tables))
    tdev = device_tables(tables)

    ref = dp_forward_backward(
        tdev, bdev, local=True, dtype=jnp.float64,
        num_match_kmers=params.num_match_kmers,
        num_indel_kmers=params.num_indel_kmers,
    )
    fwd_ref = np.asarray(ref["fwd_score"])
    weights = np.array([1.0, 0.5, 2.0, 0.25])

    v2tab = V2Tables(tables)
    assert v2tab.n_ik == 4
    fwd, counts = estep_kernel(
        tables, v2tab, bdev, weights, fwd_ref, local=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fwd), fwd_ref, rtol=1e-5, atol=1e-3)
    for name in ("match_counts", "insert_counts", "m2m", "m2i", "m2d", "m2e"):
        want = np.tensordot(weights, np.asarray(ref[name]), axes=(0, 0))
        np.testing.assert_allclose(
            np.asarray(counts[name]), want, rtol=3e-3, atol=5e-3,
            err_msg=name,
        )
