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


@pytest.mark.parametrize("y_comp", [False, True])
def test_overlap_kernel_matches_xla(y_comp):
    rng = np.random.default_rng(13)
    params = default_params()
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
