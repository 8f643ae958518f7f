"""Cross-validation of the Forward-Backward count engine by automatic
differentiation.

For a log-linear HMM, the gradient of the Forward log-partition score with
respect to each log score-table entry equals the posterior expected usage
count of that entry.  dp_forward_backward's hand-derived backward
count accumulation must therefore match jax.grad of dp_fill's forward
score with respect to the score tables — an entirely independent
derivation path through the same recursion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quaff_tpu.alphabet import DNA_ALPHABET
from quaff_tpu.dp.counts import dp_forward_backward
from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables, dp_fill
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import sparse_envelope
from quaff_tpu.io.fastseq import FastSeq, KmerIndex
from quaff_tpu.model.params import default_params


def test_counts_equal_forward_gradients():
    rng = np.random.default_rng(5)
    tables = ScoreTables.from_params(default_params())
    xl, yl = 220, 160
    xs = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, xl))
    ys = list(xs[30 : 30 + yl])
    for i in range(len(ys)):
        if rng.random() < 0.08:
            ys[i] = DNA_ALPHABET[int(rng.integers(0, 4))]
    y = FastSeq(
        name="y",
        seq="".join(ys),
        qual="".join(chr(33 + int(q)) for q in rng.integers(3, 40, yl)),
    )
    x = FastSeq(name="x", seq=xs)
    env = sparse_envelope(x, KmerIndex(y, 6), band_size=64, kmer_threshold=14)
    batch = device_batch(PairBatch.build([(x, y, env)], tables))
    tdev = device_tables(tables)

    res = dp_forward_backward(
        tdev, batch, local=True, dtype=jnp.float64,
        num_match_kmers=4, num_indel_kmers=1,
    )

    def fwd_score(t):
        # finite -inf stand-in keeps the computation differentiable
        return dp_fill(
            t, batch, mode="forward", local=True,
            return_matrices=False, dtype=jnp.float64,
            neg_inf_value=-1e30,
        )["score"][0]

    grads = jax.grad(fwd_score)(tdev)

    np.testing.assert_allclose(
        np.asarray(res["match_counts"])[0],
        np.asarray(grads["match_score"]),
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(res["insert_counts"])[0],
        np.asarray(grads["insert_score"]),
        rtol=1e-8,
        atol=1e-10,
    )
    for name in ("m2m", "m2i", "m2d", "m2e"):
        np.testing.assert_allclose(
            np.asarray(res[name])[0], np.asarray(grads[name]),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )
    for name in ("i2i", "i2m", "d2d", "d2m"):
        np.testing.assert_allclose(
            float(res[name][0]), float(grads[name]),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )
