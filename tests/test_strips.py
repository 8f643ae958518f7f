"""Strip decomposition: multi-cluster envelopes split into independent
diagonal strips whose combined scores equal the bounding-band fill."""

import numpy as np
import pytest

import jax.numpy as jnp

from quaff_tpu.dp.engine import (
    PairBatch,
    combine_strip_scores,
    device_batch,
    device_tables,
    dp_fill,
    expand_strips,
)
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import make_envelope
from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
from quaff_tpu.model.params import default_params


@pytest.fixture(scope="module")
def c8f30_pair(data_dir):
    y = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    x = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    x.qual = ""
    env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=14, cell_size=24)
    return x, y, env


def test_strips_partition_diagonals(c8f30_pair):
    _, _, env = c8f30_pair
    strips = env.strips()
    assert len(strips) == 3  # self-alignment: repeat clusters at +-~170
    got = np.concatenate([s.diagonals for s in strips])
    np.testing.assert_array_equal(got, env.diagonals)
    for s in strips:
        assert np.all(np.diff(s.diagonals) == 1)
    assert sum(s.num_cells for s in strips) == env.num_cells
    # strips are narrower than the bounding band
    assert max(s.band_width for s in strips) < env.band_width


@pytest.mark.parametrize("mode", ["viterbi", "forward"])
def test_strip_scores_match_bounding_band(c8f30_pair, mode):
    x, y, env = c8f30_pair
    tables = ScoreTables.from_params(default_params())
    tdev = device_tables(tables)

    full = dp_fill(
        tdev,
        device_batch(PairBatch.build([(x, y, env)], tables)),
        mode=mode,
        local=True,
        return_matrices=False,
        dtype=jnp.float64,
    )["score"]

    strip_pairs, owner = expand_strips([(x, y, env)])
    assert len(strip_pairs) == 3
    per_strip = dp_fill(
        tdev,
        device_batch(PairBatch.build(strip_pairs, tables)),
        mode=mode,
        local=True,
        return_matrices=False,
        dtype=jnp.float64,
    )["score"]
    combined = combine_strip_scores(per_strip, owner, 1, mode=mode)
    np.testing.assert_allclose(
        combined, np.asarray(full, dtype=np.float64), rtol=1e-12, atol=1e-9
    )


def test_single_run_envelope_is_one_strip(c8f30_pair):
    x, y, _ = c8f30_pair
    env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=20, cell_size=24)
    strips = env.strips()
    assert len(strips) == 1
    np.testing.assert_array_equal(strips[0].diagonals, env.diagonals)


def _synthetic_multistrip(rng, n, yl=90):
    """Pairs whose reads match two separated regions of the ref, giving
    multi-run envelopes."""
    from quaff_tpu.alphabet import DNA_ALPHABET
    from quaff_tpu.envelope import sparse_envelope
    from quaff_tpu.io.fastseq import FastSeq

    out = []
    for b in range(n):
        core = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, yl))
        spacer = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, 160))
        xs = core + spacer + core  # repeat -> two seed clusters
        ys = list(core)
        for i in range(len(ys)):
            if rng.random() < 0.06:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        y = FastSeq(
            name=f"y{b}",
            seq="".join(ys),
            qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl)),
        )
        x = FastSeq(name=f"x{b}", seq=xs)
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=10)
        out.append((x, y, env))
    return out


@pytest.mark.parametrize("mode", ["viterbi", "forward"])
def test_packed_kernel_matches_legacy(mode):
    """Lane-packed strip batches must score identically (f32) to the
    legacy bounding-band kernel layout."""
    from quaff_tpu.dp.pallas_v2 import V2Tables, scores_v2_traceable

    rng = np.random.default_rng(21)
    tables = ScoreTables.from_params(default_params())
    pairs = _synthetic_multistrip(rng, 4)
    assert any(len(e.strips()) >= 2 for _, _, e in pairs)

    v2tab = V2Tables(tables)
    legacy = np.asarray(scores_v2_traceable(
        v2tab, device_batch(PairBatch.build(pairs, tables)),
        mode=mode, local=True, interpret=True,
    ))
    packed_b = PairBatch.build_packed(pairs, tables)
    assert packed_b.member.shape[1] < PairBatch.build(pairs, tables).member.shape[1]
    packed = np.asarray(scores_v2_traceable(
        v2tab, device_batch(packed_b), mode=mode, local=True, interpret=True,
    ))
    np.testing.assert_allclose(packed, legacy, rtol=1e-5, atol=1e-3)


def test_packed_kernel_segment_scores():
    """return_segments: per-strip end maxima from the packed kernel must
    match independent per-strip fills (pack_strips order), and the pair
    score must equal the max over its strips."""
    from quaff_tpu.dp.pallas_v2 import V2Tables, scores_v2_traceable
    from quaff_tpu.envelope import pack_strips

    rng = np.random.default_rng(27)
    tables = ScoreTables.from_params(default_params())
    pairs = _synthetic_multistrip(rng, 4)
    assert any(len(pack_strips(e, 3)) >= 2 for _, _, e in pairs)

    v2tab = V2Tables(tables)
    packed_b = PairBatch.build_packed(pairs, tables)
    packed = np.asarray(scores_v2_traceable(
        v2tab, device_batch(packed_b), mode="viterbi", local=True,
        interpret=True, return_segments=True,
    ))
    B = len(pairs)
    n_segs = packed_b.seg_d_lo.shape[1]
    scores = packed[:B]
    segmax = packed[B:].reshape(B, n_segs)

    tdev = device_tables(tables)
    for b, (x, y, env) in enumerate(pairs):
        strips = pack_strips(env, 3)
        per_strip = np.asarray(dp_fill(
            tdev,
            device_batch(PairBatch.build([(x, y, s) for s in strips], tables)),
            mode="viterbi", local=True, return_matrices=False,
            dtype=jnp.float64,
        )["score"])
        finite = np.isfinite(per_strip)
        got = segmax[b, : len(strips)]
        np.testing.assert_allclose(
            got[finite], per_strip[finite], rtol=1e-5, atol=1e-3
        )
        assert np.all(got[~finite] <= -1e30) or np.all(
            ~np.isfinite(got[~finite])
        )
        # absent segments rank below every real strip
        for k in range(len(strips), n_segs):
            assert not np.isfinite(segmax[b, k]) or segmax[b, k] <= -1e30
        np.testing.assert_allclose(
            scores[b], np.max(per_strip), rtol=1e-5, atol=1e-3
        )


def test_packed_estep_matches_engine():
    """Fused E-step on a packed batch matches the f64 engine's
    posterior-weighted totals."""
    from quaff_tpu.dp.counts import dp_forward_backward
    from quaff_tpu.dp.pallas_counts import estep_fused
    from quaff_tpu.dp.pallas_v2 import V2Tables

    rng = np.random.default_rng(23)
    tables = ScoreTables.from_params(default_params())
    pairs = _synthetic_multistrip(rng, 3)
    tdev = device_tables(tables)

    ref = dp_forward_backward(
        tdev, device_batch(PairBatch.build(pairs, tables)),
        local=True, dtype=jnp.float64, num_match_kmers=4, num_indel_kmers=1,
    )
    fwd_ref = np.asarray(ref["fwd_score"])
    null_ll = float(np.max(fwd_ref))
    y_ll_ref = np.logaddexp.reduce(np.concatenate([[null_ll], fwd_ref]))
    weights = np.exp(fwd_ref - y_ll_ref)

    v2tab = V2Tables(tables)
    fwd, y_ll, counts = estep_fused(
        tables, v2tab, device_batch(PairBatch.build_packed(pairs, tables)),
        null_ll, local=True, interpret=True,
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


def test_dp_fill_rejects_packed():
    rng = np.random.default_rng(25)
    tables = ScoreTables.from_params(default_params())
    pairs = _synthetic_multistrip(rng, 2)
    tdev = device_tables(tables)
    with pytest.raises(ValueError, match="packed"):
        dp_fill(
            tdev, device_batch(PairBatch.build_packed(pairs, tables)),
            mode="viterbi", local=True, return_matrices=False,
            dtype=jnp.float32,
        )


def test_host_batch_matches_device_batch():
    """host_batch is device_batch's numpy twin (mesh paths stack host
    arrays before one global transfer); keys, dtypes and values must
    stay in lockstep if either gains a field."""
    import numpy as np

    from quaff_tpu.dp.engine import PairBatch, device_batch, host_batch
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.envelope import sparse_envelope
    from quaff_tpu.io.fastseq import FastSeq, KmerIndex
    from quaff_tpu.model.params import default_params

    x = FastSeq(name="x", seq="ACGTACGTACGTACGTACGT")
    y = FastSeq(name="y", seq="ACGTACGAACGT", qual="IIIIIIIIIIII")
    env = sparse_envelope(x, KmerIndex(y, 6), band_size=16, kmer_threshold=1)
    tables = ScoreTables.from_params(default_params())
    for build in (PairBatch.build, PairBatch.build_packed):
        batch = build([(x, y, env)] * 2, tables)
        dev = device_batch(batch)
        host = host_batch(batch)
        assert set(dev) == set(host)
        for k in dev:
            d = np.asarray(dev[k])
            h = np.asarray(host[k])
            assert d.dtype == h.dtype, k
            np.testing.assert_array_equal(d, h, err_msg=k)


def test_packed_kernel_max_prop_invariant():
    """Bounding the del-scan reach at the max strip width (pow2) must not
    change any packed-kernel score: halo lanes already stop legal
    propagation at strip seams."""
    from quaff_tpu.dp.pallas_v2 import (
        V2Tables,
        batch_max_prop,
        scores_v2_traceable,
    )

    rng = np.random.default_rng(29)
    tables = ScoreTables.from_params(default_params())
    pairs = _synthetic_multistrip(rng, 4)
    v2tab = V2Tables(tables)
    b = PairBatch.build_packed(pairs, tables)
    mp = batch_max_prop(b)
    assert mp is not None and mp < 128 * 2  # strips are narrow here
    for mode in ("viterbi", "forward"):
        full = np.asarray(scores_v2_traceable(
            v2tab, device_batch(b), mode=mode, local=True, interpret=True,
        ))
        capped = np.asarray(scores_v2_traceable(
            v2tab, device_batch(b), mode=mode, local=True, interpret=True,
            max_prop=mp,
        ))
        np.testing.assert_array_equal(capped, full)
