"""Pod-scale overlap scoring under shard_map (8 virtual CPU devices):
sharded_overlap_kernel runs the fused Pallas overlap scorer per device
chunk with replicated pair-emission tables; its scores must equal
running overlap_scores_kernel chunk by chunk.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from quaff_tpu.alphabet import DNA_ALPHABET  # noqa: E402
from quaff_tpu.dp.overlap import OverlapScoreTables  # noqa: E402
from quaff_tpu.dp.pallas_overlap import overlap_scores_kernel  # noqa: E402
from quaff_tpu.envelope import sparse_envelope  # noqa: E402
from quaff_tpu.io.fastseq import FastSeq, KmerIndex  # noqa: E402
from quaff_tpu.model.params import default_params  # noqa: E402
from quaff_tpu.overlap import OverlapBatch  # noqa: E402
from quaff_tpu.parallel.estep import sharded_overlap_kernel  # noqa: E402


def _chunk_pairs(rng, n):
    pairs = []
    for b in range(n):
        xl = int(rng.integers(150, 200))
        xs = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, xl))
        yl = int(rng.integers(100, 130))
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
        env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
        pairs.append((x, y, env))
    return pairs


def test_sharded_overlap_kernel_matches_chunked():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")

    rng = np.random.default_rng(29)
    params = default_params()
    tables = OverlapScoreTables.from_params(params, y_complemented=False)

    # uniform chunk shapes across devices (shard_map needs one shape)
    W, LY, LX = 256, 144, 224
    chunks = []
    for _ in range(8):
        batch = OverlapBatch(
            _chunk_pairs(rng, 2), tables,
            width=W, max_y_len=LY, max_x_len=LX,
        )
        chunks.append(batch.device())

    stacked = {k: jnp.stack([c[k] for c in chunks]) for k in chunks[0]}

    devices = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, ("dp", "mp"))
    scores = sharded_overlap_kernel(mesh, tables, stacked, interpret=True)

    want = np.stack(
        [
            np.asarray(overlap_scores_kernel(tables, c, interpret=True))
            for c in chunks
        ]
    )
    got = np.asarray(scores, np.float64)
    assert got.shape == want.shape == (8, 2)
    assert np.isfinite(want).all()  # every pair overlaps by construction
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
