"""Phase-timed profile of the all-vs-all overlap TPU pipeline."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import io, time, sys, pathlib
import numpy as np

from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq, add_revcomps
from quaff_tpu import overlap as ovmod
from quaff_tpu.overlap import QuaffOverlapAligner
from quaff_tpu.model.params import default_params, QuaffNullParams

data = pathlib.Path("tests/data")
base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]

rng = np.random.default_rng(0)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
reads = []
L = len(base.seq)
for i in range(N):
    s0 = int(rng.integers(0, L // 2))
    ln = int(rng.integers(L // 3, L // 2))
    seq = list(base.seq[s0 : s0 + ln])
    qual = list(base.qual[s0 : s0 + ln])
    for _ in range(int(len(seq) * 0.05)):
        p = int(rng.integers(0, len(seq)))
        seq[p] = "acgt"[int(rng.integers(0, 4))]
    reads.append(FastSeq(name=f"r{i}", seq="".join(seq), qual="".join(qual)))

params = default_params()
null = QuaffNullParams.fit(reads)

from quaff_tpu.aligner import DPConfig
from quaff_tpu.formats.alignment import AlignmentPrinter

config = DPConfig()
aligner = QuaffOverlapAligner(params, null, config)
seqs = add_revcomps(reads)
printer = AlignmentPrinter()
import os as _os
if _os.environ.get("QUAFF_PROF_NOTHRESHOLD"):
    printer.log_odds_threshold = float("-inf")

# instrument: time the exact pass and the kernel pass
orig_exact = QuaffOverlapAligner._exact_pass
pair_time = [0.0, 0]
def timed_exact(self, seqs_, cands, **kw):
    t0 = time.perf_counter()
    r = orig_exact(self, seqs_, cands, **kw)
    pair_time[0] += time.perf_counter() - t0
    pair_time[1] += len(cands)
    return r
QuaffOverlapAligner._exact_pass = timed_exact

tb_time = [0.0]
orig_tb = ovmod.overlap_traceback
def timed_tb(*a, **kw):
    t0 = time.perf_counter()
    r = orig_tb(*a, **kw)
    tb_time[0] += time.perf_counter() - t0
    return r
ovmod.overlap_traceback = timed_tb

from quaff_tpu.dp import pallas_overlap
orig_k = pallas_overlap.overlap_scores_kernel
k_time = [0.0, 0]
def timed_k(*a, **kw):
    t0 = time.perf_counter()
    r = orig_k(*a, **kw)
    if isinstance(r, tuple):
        [np.asarray(v) for v in r]
    else:
        np.asarray(r)
    k_time[0] += time.perf_counter() - t0
    k_time[1] += 1
    return r
pallas_overlap.overlap_scores_kernel = timed_k

for it in range(2):
    pair_time[0] = 0.0; pair_time[1] = 0
    tb_time[0] = 0.0
    k_time[0] = 0.0; k_time[1] = 0
    out = io.StringIO()
    t0 = time.perf_counter()
    aligner.align_all(out, seqs, N, printer)
    t1 = time.perf_counter()
    print(
        f"iter{it}: N={N} tasks={N*(N-1)} upairs={N*(N-1)//2} wall={t1-t0:.2f}s "
        f"upairs/s={N*(N-1)//2/(t1-t0):.1f} "
        f"kernel={k_time[0]:.2f}s/{k_time[1]} exact_pairs={pair_time[0]:.2f}s/{pair_time[1]} "
        f"(traceback={tb_time[0]:.2f}s) "
        f"other={t1-t0-k_time[0]-pair_time[0]:.2f}s out_lines={out.getvalue().count(chr(10))}",
        flush=True,
    )
