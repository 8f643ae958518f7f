"""Pod-scale fused Pallas E-step under shard_map (8 virtual CPU devices).

sharded_estep_kernel runs the production single-dispatch fused E-step
(dp/pallas_counts.py) per device and psums the count totals over the
mesh; its results must equal running estep_fused_multi chunk by chunk
and summing host-side.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from quaff_tpu.aligner import DPConfig, FWDBACK_CELL_SIZE  # noqa: E402
from quaff_tpu.alphabet import DNA_ALPHABET, QUAL_SCORE_RANGE  # noqa: E402
from quaff_tpu.dp.engine import PairBatch, device_batch  # noqa: E402
from quaff_tpu.dp.pallas_counts import estep_fused_multi  # noqa: E402
from quaff_tpu.dp.pallas_v2 import V2Tables  # noqa: E402
from quaff_tpu.dp.scores import ScoreTables  # noqa: E402
from quaff_tpu.io.fastseq import FastSeq, KmerIndex  # noqa: E402
from quaff_tpu.model.params import QuaffNullParams, default_params  # noqa: E402
from quaff_tpu.parallel.estep import sharded_estep_kernel  # noqa: E402


def test_sharded_kernel_estep_matches_chunked():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")

    rng = np.random.default_rng(23)
    params = default_params()
    tables = ScoreTables.from_params(params)
    v2tab = V2Tables(tables)

    def rand_seq(n):
        return "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, n))

    refs = [FastSeq(name=f"ref{i}", seq=rand_seq(100)) for i in range(2)]
    reads = []
    for i in range(8):
        src = refs[i % 2].seq[5:85]
        toks = [
            int(rng.integers(0, 4)) if rng.random() < 0.05
            else DNA_ALPHABET.index(c)
            for c in src
        ]
        seq = "".join(DNA_ALPHABET[t] for t in toks)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(5, 30, len(seq)))
        reads.append(FastSeq(name=f"read{i}", seq=seq, qual=qual))
    null = QuaffNullParams.fit(reads)

    config = DPConfig(sparse=False)
    W, LP = 128, 128  # uniform chunk shapes across devices

    chunks, gids, nulls = [], [], []
    for y in reads:
        yi = KmerIndex(y, config.kmer_len)
        pairs = [
            (x, y, config.make_envelope(x, yi, FWDBACK_CELL_SIZE))
            for x in refs
        ]
        batch = PairBatch.build_packed(
            pairs, tables, width=W, max_y_len=LP
        )
        chunks.append(device_batch(batch))
        gids.append(np.zeros(len(pairs), np.int32))
        nulls.append([null.log_likelihood(y)])

    stacked = {
        k: jnp.stack([c[k] for c in chunks]) for k in chunks[0]
    }
    gid = jnp.asarray(np.stack(gids))
    null_ll = jnp.asarray(np.stack(nulls), jnp.float32)

    devices = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, ("dp", "mp"))
    Km = params.num_match_kmers
    Ki = params.num_indel_kmers
    fwd, y_ll, totals = sharded_estep_kernel(
        mesh, v2tab, stacked, gid, null_ll,
        local=True, Km=Km, Ki=Ki, interpret=True,
    )

    # reference: one estep_fused_multi call per chunk, host-side sum
    want = {}
    fwd_ref, yll_ref = [], []
    for c, g, nl in zip(chunks, gids, nulls):
        f, yl, tot = estep_fused_multi(
            tables, v2tab, c, g, np.asarray(nl), local=True, interpret=True
        )
        fwd_ref.append(np.asarray(f))
        yll_ref.append(np.asarray(yl))
        for k in ("match_counts", "insert_counts", "m2m", "m2i", "m2d",
                  "m2e"):
            want[k] = want.get(k, 0) + np.asarray(tot[k], np.float64)
        for k in ("i2i", "i2m", "d2d", "d2m"):
            want[k] = want.get(k, 0) + float(np.sum(np.asarray(tot[k])))

    np.testing.assert_allclose(
        np.asarray(fwd, np.float64), np.stack(fwd_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_ll, np.float64), np.stack(yll_ref), rtol=1e-5, atol=1e-5
    )
    for k, w in want.items():
        np.testing.assert_allclose(
            np.asarray(totals[k], np.float64), w,
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
