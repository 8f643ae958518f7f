"""Benchmark: banded Viterbi DP throughput on the c8f30 align config.

Measures steady-state in-envelope DP cells/s for the flagship kernel
(batched banded Viterbi fill, float32) on whatever accelerator JAX
exposes.  Prints ONE JSON line.

vs_baseline is computed against an estimated 2.5e7 cells/s for the
reference's single-threaded scalar C++ DP loop (3-state log-space
recursion with lookup-table log-sum-exp; the reference publishes no
numbers, see BASELINE.md — this is a documented engineering estimate of
qmodel.cpp:1512-1560 on one modern core).
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

REFERENCE_CELLS_PER_SEC_EST = 2.5e7


def main():
    import jax
    import jax.numpy as jnp

    from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables, dp_fill
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.envelope import make_envelope
    from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
    from quaff_tpu.model.params import default_params

    data = pathlib.Path(__file__).parent / "tests" / "data"
    reads = read_fast_seqs(str(data / "c8f30.fastq.gz"))
    y = reads[0]
    x = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    x.qual = ""

    params = default_params()
    tables = ScoreTables.from_params(params)
    y_index = KmerIndex(y, 6)
    env = make_envelope(x, y_index, kmer_threshold=-1, cell_size=24, max_size=10 << 20)

    batch_size = int(os.environ.get("QUAFF_BENCH_BATCH", "32"))
    pairs = [(x, y, env)] * batch_size
    batch = PairBatch.build(pairs, tables)
    tdev = device_tables(tables)
    bdev = device_batch(batch)

    cells_per_pair = env.num_cells

    def run():
        return dp_fill(
            tdev, bdev, mode="viterbi", local=True,
            return_matrices=False, dtype=jnp.float32,
        )["score"]

    # warmup/compile
    scores = run()
    scores.block_until_ready()

    n_iters = int(os.environ.get("QUAFF_BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        scores = run()
    scores.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    total_cells = cells_per_pair * batch_size
    cells_per_sec = total_cells / dt

    print(
        json.dumps(
            {
                "metric": "banded_viterbi_cells_per_sec",
                "value": round(cells_per_sec, 1),
                "unit": "DP cells/s (in-envelope, c8f30 align config, f32)",
                "vs_baseline": round(cells_per_sec / REFERENCE_CELLS_PER_SEC_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
