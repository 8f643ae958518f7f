"""Pod-scale production align scoring under shard_map (8 virtual CPU
devices): sharded_align_kernel runs the v2 Pallas banded Viterbi scorer
per device chunk; its scores must equal running scores_v2_traceable
chunk by chunk.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from quaff_tpu.aligner import DPConfig, VITERBI_CELL_SIZE  # noqa: E402
from quaff_tpu.alphabet import DNA_ALPHABET  # noqa: E402
from quaff_tpu.dp.engine import PairBatch, device_batch  # noqa: E402
from quaff_tpu.dp.pallas_v2 import V2Tables, scores_v2_traceable  # noqa: E402
from quaff_tpu.dp.scores import ScoreTables  # noqa: E402
from quaff_tpu.io.fastseq import FastSeq, KmerIndex  # noqa: E402
from quaff_tpu.model.params import default_params  # noqa: E402
from quaff_tpu.parallel.estep import sharded_align_kernel  # noqa: E402


def test_sharded_align_kernel_matches_chunked():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")

    rng = np.random.default_rng(7)
    params = default_params()
    tables = ScoreTables.from_params(params)
    v2tab = V2Tables(tables)

    def rand_seq(n):
        return "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, n))

    refs = [FastSeq(name=f"ref{i}", seq=rand_seq(120)) for i in range(2)]
    reads = []
    for i in range(8):
        src = refs[i % 2].seq[10:90]
        toks = [
            int(rng.integers(0, 4)) if rng.random() < 0.08
            else DNA_ALPHABET.index(c)
            for c in src
        ]
        seq = "".join(DNA_ALPHABET[t] for t in toks)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(5, 30, len(seq)))
        reads.append(FastSeq(name=f"read{i}", seq=seq, qual=qual))

    config = DPConfig(sparse=False)
    W, LP = 128, 128  # uniform chunk shapes across devices

    chunks = []
    for y in reads:
        yi = KmerIndex(y, config.kmer_len)
        pairs = [
            (x, y, config.make_envelope(x, yi, VITERBI_CELL_SIZE))
            for x in refs
        ]
        batch = PairBatch.build_packed(pairs, tables, width=W, max_y_len=LP)
        chunks.append(device_batch(batch))

    stacked = {k: jnp.stack([c[k] for c in chunks]) for k in chunks[0]}

    devices = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, ("dp", "mp"))
    scores = sharded_align_kernel(
        mesh, v2tab, stacked, mode="viterbi", local=True, interpret=True
    )

    want = np.stack(
        [
            np.asarray(
                scores_v2_traceable(
                    v2tab, c, mode="viterbi", local=True, interpret=True
                )
            )
            for c in chunks
        ]
    )
    got = np.asarray(scores, np.float64)
    assert got.shape == want.shape == (8, len(refs))
    assert np.isfinite(want).any()  # the workload actually aligns
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
