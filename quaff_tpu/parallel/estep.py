"""Sharded batch execution: data-parallel reads x ref-parallel references.

The production-scale E-step: pair arrays carry leading dims [R reads,
K refs]; reads shard over the mesh's "dp" axis, refs over "mp", score
tables replicate.  Inside shard_map each device fills its local pair
block with the banded DP kernels, the per-read log-likelihood is reduced
with a mesh-wide log-sum-exp over the ref axis (pmax + psum), posterior
count weighting happens on-device, and the final count pytree is psum'd
over both axes — the TPU equivalent of the reference's client-side
addWeighted/finalCounts merge (qmodel.cpp:2416-2418).

Differences from the sequential-parity path (trainer.py): every pair's
backward pass is computed (posterior weighting makes negligible
contributions harmless) instead of the reference's running-loglike Δ=20
skip, and ref ordering is irrelevant.  The log-likelihood and expected
counts agree with the reference up to that pruning heuristic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..dp.counts import dp_forward_backward
from ..dp.engine import NEG_INF, dp_fill


def _lse_over_axis(x, axis_name):
    """Numerically-stable log-sum-exp across a mesh axis (elementwise)."""
    m = jax.lax.pmax(x, axis_name)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jax.lax.psum(jnp.exp(x - m), axis_name)
    return jnp.where(s > 0, m + jnp.log(s), NEG_INF)


def _flatten_rk(tree):
    """[R, K, ...] -> [R*K, ...] for every leaf."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]), tree
    )


def sharded_viterbi_scores(
    mesh: Mesh, tables_dev: dict, pair_arrays: dict, local: bool = True,
    dtype=jnp.float32,
):
    """Viterbi end scores for an [R, K] pair grid, sharded (dp, mp)."""

    def body(tables, pairs):
        r, k = pairs["y_len"].shape[:2]
        flat = _flatten_rk(pairs)
        scores = dp_fill(
            tables, flat, mode="viterbi", local=local,
            return_matrices=False, dtype=dtype,
        )["score"]
        return scores.reshape(r, k)

    pspec = {name: P("dp", "mp") for name in pair_arrays}
    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), pspec),
        out_specs=P("dp", "mp"),
        check_vma=False,
    )
    return f(tables_dev, pair_arrays)


def sharded_estep(
    mesh: Mesh,
    tables_dev: dict,
    pair_arrays: dict,
    null_loglike: jnp.ndarray,  # [R] per-read null-model log-likelihood
    local: bool = True,
    dtype=jnp.float32,
    num_match_kmers: int = 4,
    num_indel_kmers: int = 1,
):
    """Full sharded E-step over an [R, K] pair grid.

    Returns (replicated) total count pytree and total log-likelihood, plus
    per-read log-likelihoods [R] (sharded over dp).
    """

    count_fields = (
        "match_counts",
        "insert_counts",
        "m2m",
        "m2i",
        "m2d",
        "m2e",
        "i2i",
        "i2m",
        "d2d",
        "d2m",
    )

    def body(tables, pairs, null_ll):
        r, k = pairs["y_len"].shape[:2]
        flat = _flatten_rk(pairs)
        res = dp_forward_backward(
            tables,
            flat,
            local=local,
            dtype=dtype,
            num_match_kmers=num_match_kmers,
            num_indel_kmers=num_indel_kmers,
        )
        fwd = res["fwd_score"].reshape(r, k).astype(jnp.float32)
        # per-read loglike: lse over ALL refs (mesh-wide) + the null model
        local_max = jnp.max(fwd, axis=1)
        m = jax.lax.pmax(local_max, "mp")
        m = jnp.maximum(m, null_ll)
        m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
        sum_local = jnp.sum(jnp.exp(fwd - m_safe[:, None]), axis=1)
        sum_all = jax.lax.psum(sum_local, "mp") + jnp.exp(null_ll - m_safe)
        y_loglike = jnp.where(sum_all > 0, m_safe + jnp.log(sum_all), NEG_INF)
        # posterior weight of each (read, ref) pair
        w = jnp.where(
            jnp.isfinite(fwd), jnp.exp(fwd - y_loglike[:, None]), 0.0
        )  # [r, k]
        totals = {}
        for name in count_fields:
            c = res[name].reshape((r, k) + res[name].shape[1:])
            wc = w.reshape(w.shape + (1,) * (c.ndim - 2)).astype(c.dtype)
            local_sum = jnp.sum(c * wc, axis=(0, 1))
            totals[name] = jax.lax.psum(local_sum, ("dp", "mp"))
        # y_loglike is already replicated over mp; reduce over dp only
        loglike = jax.lax.psum(jnp.sum(y_loglike), "dp")
        return totals, loglike, y_loglike

    pspec = {name: P("dp", "mp") for name in pair_arrays}
    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), pspec, P("dp")),
        out_specs=(P(), P(), P("dp")),
        check_vma=False,
    )
    return f(tables_dev, pair_arrays, null_loglike)


def build_pair_grid(
    refs, reads, tables, config, cell_size: int
) -> Tuple[dict, np.ndarray]:
    """Host-side assembly of the [R, K] pair-grid arrays.

    Pads reads to R divisible by the dp axis and refs to K divisible by mp
    (padding pairs get empty envelopes -> -inf scores, zero counts).
    """
    from ..dp.engine import PairBatch
    from ..io.fastseq import KmerIndex

    R, K = len(reads), len(refs)
    pairs = []
    for y in reads:
        y_index = KmerIndex(y, config.kmer_len)
        for x in refs:
            env = config.make_envelope(x, y_index, cell_size)
            pairs.append((x, y, env))
    batch = PairBatch.build(pairs, tables)
    from ..dp.engine import device_batch

    flat = device_batch(batch)
    grid = {
        name: jnp.reshape(arr, (R, K) + arr.shape[1:]) for name, arr in flat.items()
    }
    return grid, np.array([len(y.seq) for y in reads])
