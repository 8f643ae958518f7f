"""Sequence-parallel (band-sharded) fill equivalence test.

The band is partitioned over an "sp" mesh axis (4 virtual devices); the
distributed fill — halo exchanges for the insert dependency, a
distributed semiring prefix scan for the delete recursion, and a mesh
end-reduction — must reproduce the single-device engine's scores exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from quaff_tpu.alphabet import DNA_ALPHABET
from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables, dp_fill
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import sparse_envelope
from quaff_tpu.io.fastseq import FastSeq, KmerIndex
from quaff_tpu.model.params import default_params
from quaff_tpu.parallel.spfill import sp_fill_scores


def _pairs(rng, n):
    out = []
    for b in range(n):
        xl = int(rng.integers(200, 300))
        yl = int(rng.integers(120, 180))
        xs = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, xl))
        start = int(rng.integers(0, xl - yl))
        ys = list(xs[start : start + yl])
        for i in range(len(ys)):
            if rng.random() < 0.1:
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


@pytest.mark.parametrize("mode", ["viterbi", "forward"])
def test_sp_fill_matches_single_device(mode):
    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    S = 4
    rng = np.random.default_rng(21)
    tables = ScoreTables.from_params(default_params())
    pairs = _pairs(rng, 3)
    # pad band width to a multiple of the sp axis
    wmax = max(e.band_width for _, _, e in pairs)
    wpad = ((wmax + S - 1) // S) * S
    batch = PairBatch.build(pairs, tables, width=wpad)
    bdev = device_batch(batch)
    tdev = device_tables(tables)

    ref = np.asarray(
        dp_fill(tdev, bdev, mode=mode, local=True, return_matrices=False,
                dtype=jnp.float64)["score"]
    )

    mesh = Mesh(np.array(devices[:S]), ("sp",))
    got = np.asarray(
        sp_fill_scores(mesh, tdev, bdev, mode=mode, local=True, dtype=jnp.float64)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-6)
