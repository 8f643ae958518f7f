"""Micro-benchmark the native C++ exact fills (overlapdp.cpp).

Times qdp_overlap_fill and qdp_align_fill (viterbi + forward) on the
c8f30 self-overlap/self-align workloads, printing wall time and
in-envelope cells/s per core (single call, no thread pool).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import time
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from quaff_tpu.io.fastseq import read_fast_seqs, KmerIndex
from quaff_tpu.model.params import default_params
from quaff_tpu.dp.overlap import OverlapScoreTables
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.overlap import OverlapBatch
from quaff_tpu.dp.engine import PairBatch
from quaff_tpu.aligner import DPConfig, VITERBI_CELL_SIZE
from quaff_tpu import native

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
y = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
x = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]

params = default_params()
config = DPConfig()

# ---- overlap fill ----
config.kmer_threshold = 14
otables = OverlapScoreTables.from_params(params, False)
env = config.make_envelope(x, KmerIndex(y, config.kmer_len), VITERBI_CELL_SIZE)
ob = OverlapBatch([(x, y, env)], otables)
cells = env.num_cells
n_iters = 5
native.overlap_fill_native(ob, otables)  # warm (table prep)
t0 = time.perf_counter()
for _ in range(n_iters):
    res = native.overlap_fill_native(ob, otables)
dt = (time.perf_counter() - t0) / n_iters
print(f"overlap_fill: {dt*1e3:.1f} ms  {cells/dt/1e6:.1f} Mcells/s "
      f"(W={env.band_width} cells={cells}) score={res['score'][0]:.2f}")

# ---- align fills ----
atables = ScoreTables.from_params(params)
xs = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
xs.qual = ""
env2 = config.make_envelope(xs, KmerIndex(y, config.kmer_len),
                            VITERBI_CELL_SIZE)
pb = PairBatch.build([(xs, y, env2)], atables)
cells2 = env2.num_cells
for mode in ("viterbi", "forward"):
    native.align_fill_native(pb, atables, mode=mode)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        res = native.align_fill_native(pb, atables, mode=mode)
    dt = (time.perf_counter() - t0) / n_iters
    print(f"align_fill[{mode}]: {dt*1e3:.1f} ms  {cells2/dt/1e6:.1f} Mcells/s "
          f"(W={env2.band_width} cells={cells2}) score={res['score'][0]:.4f}")
