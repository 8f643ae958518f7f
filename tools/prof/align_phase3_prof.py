"""Wall breakdown of the round-3 pipelined align at N reads (TPU):
phase A prep, phase B build/dispatch, worker fill/traceback (thread-sum),
and residual main-thread time."""
import sys, pathlib, time, io, threading
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import bench
from quaff_tpu.aligner import DPConfig, QuaffAligner
from quaff_tpu.formats.alignment import AlignmentPrinter
from quaff_tpu.io.fastseq import read_fast_seqs
from quaff_tpu.model.params import QuaffNullParams, default_params

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
ref = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]; ref.qual = ""
n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T = int(sys.argv[2]) if len(sys.argv) > 2 else 4

acc = {}
lock = threading.Lock()
def timed(tag, fn, fence=None):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        r = fn(*a, **kw)
        if fence:
            fence(r)
        dt = time.perf_counter() - t0
        with lock:
            e = acc.setdefault(tag, [0.0, 0])
            e[0] += dt; e[1] += 1
        return r
    return wrap

import quaff_tpu.aligner as amod
import quaff_tpu.dp.pallas_v2 as pv2
import quaff_tpu.native as nat
from quaff_tpu.dp.engine import PairBatch

pv2.scores_v2_device = timed("B.dispatch", pv2.scores_v2_device)
nat.align_fill_native = timed("C.fill(worker-sum)", nat.align_fill_native)
nat_score = nat.align_score_native
nat.align_score_native = timed("C.stripscore(worker-sum)", nat_score)
amod.viterbi_traceback = timed("C.tb(worker-sum)", amod.viterbi_traceback)
import quaff_tpu.dp.traceback as tbmod
tbmod.viterbi_path_traceback = timed("C.path(worker-sum)", tbmod.viterbi_path_traceback)
PairBatch.build_packed = classmethod(timed(
    "B.build_packed", PairBatch.build_packed.__func__))
_ob = PairBatch.build
PairBatch.build = classmethod(timed("build", _ob.__func__))
amod.make_envelope = timed("A.envelope", amod.make_envelope)
_asarray = np.asarray

reads0 = bench._perturbed_reads(data, n, 0)
null = QuaffNullParams.fit(reads0)
printer = AlignmentPrinter(); printer.log_odds_threshold = float("-inf")
aligner = QuaffAligner(default_params(), null,
                       DPConfig(kmer_threshold=14, threads=T))
aligner.align_all(io.StringIO(), [ref], reads0, printer)  # warm
for it in range(2):
    acc.clear()
    reads = bench._perturbed_reads(data, n, it + 1)
    out = io.StringIO()
    t0 = time.perf_counter()
    aligner.align_all(out, [ref], reads, printer)
    wall = time.perf_counter() - t0
    assert "Score" in out.getvalue()
    parts = "  ".join(
        f"{k}={v[0]:.3f}s/{v[1]}" for k, v in sorted(acc.items())
    )
    print(f"iter{it} n={n} T={T} wall={wall:.3f}s ({n/wall:.1f} r/s)  {parts}",
          flush=True)
