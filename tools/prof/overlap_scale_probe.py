"""Overlap all-vs-all scale probe: bench-identical workload at N reads.

Times warm passes with per-salt DISTINCT inputs (the axon runtime caches
identical executions) through the production pipeline, exactly like
bench.py::time_overlap, and prints per-pass walls + pairs/s.  Run with
QUAFF_OV_TIMELINE=1 for phase stamps.

    python tools/prof/overlap_scale_probe.py 64 [n_passes]
"""
import io
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import bench
from quaff_tpu.aligner import DPConfig
from quaff_tpu.formats.alignment import AlignmentPrinter
from quaff_tpu.io.fastseq import add_revcomps
from quaff_tpu.model.params import QuaffNullParams, default_params
from quaff_tpu.overlap import QuaffOverlapAligner

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

params = default_params()
config = DPConfig(kmer_threshold=14, threads=4)
printer = AlignmentPrinter()
printer.log_odds_threshold = float("-inf")

pairs = N * (N - 1) // 2
walls = []
for salt in range(n_passes + 1):  # salt 0 = warm/compile pass
    reads = bench._overlap_reads(N, salt)
    null = QuaffNullParams.fit(reads)
    ov = QuaffOverlapAligner(params, null, config)
    seqs = add_revcomps(reads)
    out = io.StringIO()
    t0 = time.perf_counter()
    ov.align_all(out, seqs, N, printer)
    dt = time.perf_counter() - t0
    walls.append(dt)
    print(
        f"pass{salt}: N={N} pairs={pairs} wall={dt:.2f}s "
        f"pairs/s={pairs/dt:.1f} out_lines={out.getvalue().count(chr(10))}",
        flush=True,
    )
warm = float(np.median(walls[1:])) if len(walls) > 1 else walls[0]
print(f"warm median: {warm:.2f}s = {pairs/warm:.1f} pairs/s")
