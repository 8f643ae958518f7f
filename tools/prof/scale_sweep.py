"""Align + EM scale sweep in ONE process (verdict #3: 1024-8192 reads).

One process so the axon server-side kernel recompile (20-500 s,
pathological-state dependent) is paid once; each size then measures
warm passes with distinct inputs.  Prints one line per point,
unbuffered — run with `python -u`, redirect to a file, and poll.

    python -u tools/prof/scale_sweep.py align 1024 2048 4096 8192
    python -u tools/prof/scale_sweep.py em 1024 2048 4096 8192
"""
import io
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

import bench
from quaff_tpu.aligner import DPConfig, QuaffAligner
from quaff_tpu.formats.alignment import AlignmentPrinter
from quaff_tpu.io.fastseq import read_fast_seqs
from quaff_tpu.model.params import (
    QuaffNullParams,
    QuaffParamCounts,
    default_params,
)
from quaff_tpu.trainer import QuaffCounter

mode = sys.argv[1] if len(sys.argv) > 1 else "align"
sizes = [int(a) for a in sys.argv[2:]] or [1024, 2048, 4096, 8192]

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
ref = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
ref.qual = ""
refs = [ref]
params = default_params()
config = DPConfig(kmer_threshold=14, threads=4)

if mode == "align":
    printer = AlignmentPrinter()
    printer.log_odds_threshold = float("-inf")
    reads0 = bench._perturbed_reads(data, min(sizes), 0)
    null = QuaffNullParams.fit(reads0)
    aligner = QuaffAligner(params, null, config)
    t0 = time.perf_counter()
    aligner.align_all(io.StringIO(), refs, reads0, printer)
    print(f"warm/compile pass ({min(sizes)} reads): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    for n in sizes:
        ts = []
        for salt in (1, 2, 3):
            reads = bench._perturbed_reads(data, n, salt)
            out = io.StringIO()
            t0 = time.perf_counter()
            aligner.align_all(out, refs, reads, printer)
            ts.append(time.perf_counter() - t0)
            assert "Score" in out.getvalue()
        dt = float(np.median(ts))
        print(f"align n={n}: {dt:.2f}s = {n/dt:.1f} reads/s "
              f"(passes {['%.2f' % t for t in ts]})", flush=True)
else:
    reads0 = bench._perturbed_reads(data, min(sizes), 0)
    null = QuaffNullParams.fit(reads0)
    counter = QuaffCounter(params, null, config, True)
    t0 = time.perf_counter()
    counter.get_counts(refs, reads0, [[0] for _ in reads0])
    print(f"warm/compile E-step ({min(sizes)} reads): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    for n in sizes:
        qp = params
        ts = []
        for salt in (4, 5, 6):
            reads = bench._perturbed_reads(data, n, salt)
            counter = QuaffCounter(qp, null, config, True)
            t0 = time.perf_counter()
            counts, ll, _ = counter.get_counts(
                refs, reads, [[0] for _ in reads]
            )
            cwp = QuaffParamCounts.zero(
                qp.match_kmer_len, qp.indel_kmer_len
            )
            cwp.add_weighted(counts, 1.0)
            qp = cwp.fit()
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"em n={n}: {dt:.2f}s/iter = {dt/n*1000:.2f} ms/read "
              f"(passes {['%.2f' % t for t in ts]})", flush=True)
