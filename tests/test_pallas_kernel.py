"""Pallas banded-fill kernel equivalence tests (interpreter mode on CPU).

The kernel must agree with the XLA scan engine on Viterbi and Forward
scores over random banded pairs, including boundary conditions (-global
mode, reads longer than refs, ragged batch lengths).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quaff_tpu.alphabet import DNA_ALPHABET
from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables, dp_fill
from quaff_tpu.dp.pallas_kernel import viterbi_scores
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import full_envelope, sparse_envelope
from quaff_tpu.io.fastseq import FastSeq, KmerIndex
from quaff_tpu.model.params import default_params


def _random_pairs(rng, n, noise=0.1, with_qual=True):
    pairs = []
    for b in range(n):
        xl = int(rng.integers(120, 260))
        yl = int(rng.integers(80, min(200, xl)))
        xs = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, xl))
        start = int(rng.integers(0, xl - yl))
        ys = list(xs[start : start + yl])
        for i in range(len(ys)):
            if rng.random() < noise:
                ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
        qual = (
            "".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl))
            if with_qual
            else ""
        )
        x = FastSeq(name=f"x{b}", seq=xs)
        y = FastSeq(name=f"y{b}", seq="".join(ys), qual=qual)
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
        pairs.append((x, y, env))
    return pairs


@pytest.mark.parametrize("mode", ["viterbi", "forward"])
@pytest.mark.parametrize("local", [True, False])
def test_pallas_matches_xla(mode, local):
    rng = np.random.default_rng(42)
    tables = ScoreTables.from_params(default_params())
    pairs = _random_pairs(rng, 6)
    batch = PairBatch.build(pairs, tables)
    bdev = device_batch(batch)
    tdev = device_tables(tables)
    ref = np.asarray(
        dp_fill(tdev, bdev, mode=mode, local=local, return_matrices=False,
                dtype=jnp.float32)["score"]
    )
    got = np.asarray(
        viterbi_scores(tables, bdev, mode=mode, local=local, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)


def test_pallas_noqual_and_full_envelope():
    rng = np.random.default_rng(7)
    tables = ScoreTables.from_params(default_params())
    pairs = _random_pairs(rng, 3, with_qual=False)
    # replace one envelope with a full envelope
    x, y, _ = pairs[0]
    pairs[0] = (x, y, full_envelope(len(x.seq), len(y.seq)))
    batch = PairBatch.build(pairs, tables)
    bdev = device_batch(batch)
    tdev = device_tables(tables)
    ref = np.asarray(
        dp_fill(tdev, bdev, mode="viterbi", local=True, return_matrices=False,
                dtype=jnp.float32)["score"]
    )
    got = np.asarray(
        viterbi_scores(tables, bdev, mode="viterbi", local=True, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-3)
