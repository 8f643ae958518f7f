"""Attribute the overlap exact-pass wall at scale N.

Monkeypatch accumulators around the native strip scorer, the native
path fill, column->string rendering, and the printer write, then run one
warm production pass.  Per-call walls SUM across pool threads, so the
numbers are core-seconds (compare against threads x phase wall).

    python tools/prof/overlap_exact_breakdown.py 64
"""
import io
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import bench
from quaff_tpu import native as natmod
from quaff_tpu.aligner import DPConfig
from quaff_tpu.dp import traceback as tbmod
from quaff_tpu.formats.alignment import AlignmentPrinter
from quaff_tpu.io.fastseq import add_revcomps
from quaff_tpu.model.params import QuaffNullParams, default_params
from quaff_tpu import overlap as ovmod
from quaff_tpu.overlap import QuaffOverlapAligner

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64

acc = {}


def timed(mod, name, key=None):
    key = key or name
    orig = getattr(mod, name)
    acc[key] = [0.0, 0]

    def wrap(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        acc[key][0] += time.perf_counter() - t0
        acc[key][1] += 1
        return r

    setattr(mod, name, wrap)


# NOTE: overlap.py imports these inside functions (from .native import ...)
# so patch the source modules BEFORE the pass runs
timed(natmod, "overlap_strip_score_native", "strip_score")
timed(natmod, "overlap_viterbi_path_cols", "path_fill")
timed(natmod, "overlap_viterbi_path_cols_batch", "path_fill_batch")
timed(tbmod, "_cols_to_str", "cols_to_str")
timed(AlignmentPrinter, "write_alignment", "write")
timed(ovmod, "_insert_score_sum", "insert_score")
timed(QuaffOverlapAligner, "_strip_jobs", "strip_jobs")
timed(QuaffOverlapAligner, "_null_ll", "null_ll")

params = default_params()
config = DPConfig(kmer_threshold=14, threads=4)
printer = AlignmentPrinter()
printer.log_odds_threshold = float("-inf")

pairs = N * (N - 1) // 2
for salt in (0, 1):
    for k in acc:
        acc[k][0] = 0.0
        acc[k][1] = 0
    reads = bench._overlap_reads(N, salt)
    null = QuaffNullParams.fit(reads)
    ov = QuaffOverlapAligner(params, null, config)
    seqs = add_revcomps(reads)
    out = io.StringIO()
    t0 = time.perf_counter()
    ov.align_all(out, seqs, N, printer)
    dt = time.perf_counter() - t0
    print(f"pass{salt}: wall={dt:.2f}s pairs/s={pairs/dt:.1f}")
    for k, (t, n) in sorted(acc.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:14s} {t:7.2f} core-s  n={n}")
