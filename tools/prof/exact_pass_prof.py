"""Phase attribution inside the all-vs-all overlap exact pass: batch
build vs native fill vs traceback/finish, on the production TPU path."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import io, time
import numpy as np

from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq, add_revcomps
from quaff_tpu import overlap as ovmod
from quaff_tpu.overlap import QuaffOverlapAligner, OverlapBatch
from quaff_tpu.model.params import default_params, QuaffNullParams

data = pathlib.Path("tests/data")
base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]

rng = np.random.default_rng(0)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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

T = {"build": 0.0, "fill": 0.0, "finish": 0.0, "strip_pack": 0.0,
     "n_fill_rows": 0, "n_pairs": 0, "n_flush": 0, "write": 0.0,
     "env": 0.0, "kdisp": 0.0, "n_kdisp": 0, "exact": 0.0}

import quaff_tpu.dp.pallas_overlap as pov

orig_kernel = pov.overlap_scores_kernel
def timed_kernel(*a, **kw):
    t0 = time.perf_counter()
    r = orig_kernel(*a, **kw)
    T["kdisp"] += time.perf_counter() - t0
    T["n_kdisp"] += 1
    return r
pov.overlap_scores_kernel = timed_kernel

orig_env = type(config).make_envelope
def timed_env(self, *a, **kw):
    t0 = time.perf_counter()
    r = orig_env(self, *a, **kw)
    T["env"] += time.perf_counter() - t0
    return r
type(config).make_envelope = timed_env

orig_exact = QuaffOverlapAligner._exact_pass
def timed_exact(self, *a, **kw):
    t0 = time.perf_counter()
    r = orig_exact(self, *a, **kw)
    T["exact"] += time.perf_counter() - t0
    return r
QuaffOverlapAligner._exact_pass = timed_exact

orig_init = OverlapBatch.__init__
def timed_init(self, *a, **kw):
    t0 = time.perf_counter()
    orig_init(self, *a, **kw)
    T["build"] += time.perf_counter() - t0
OverlapBatch.__init__ = timed_init

orig_fill = QuaffOverlapAligner._exact_fill
def timed_fill(self, batch, tables, tdev):
    t0 = time.perf_counter()
    r = orig_fill(self, batch, tables, tdev)
    T["fill"] += time.perf_counter() - t0
    T["n_fill_rows"] += batch.base.member.shape[0]
    T["n_flush"] += 1
    return r
QuaffOverlapAligner._exact_fill = timed_fill

orig_finish = QuaffOverlapAligner._finish_pair
def timed_finish(self, *a, **kw):
    t0 = time.perf_counter()
    r = orig_finish(self, *a, **kw)
    T["finish"] += time.perf_counter() - t0
    T["n_pairs"] += 1
    return r
QuaffOverlapAligner._finish_pair = timed_finish

orig_write = AlignmentPrinter.write_alignment
def timed_write(self, *a, **kw):
    t0 = time.perf_counter()
    r = orig_write(self, *a, **kw)
    T["write"] += time.perf_counter() - t0
    return r
AlignmentPrinter.write_alignment = timed_write

for it in range(2):
    for k in T:
        T[k] = 0
    out = io.StringIO()
    t0 = time.perf_counter()
    aligner.align_all(out, seqs, N, printer)
    wall = time.perf_counter() - t0
    print(
        f"iter{it}: wall={wall:.2f}s env={T['env']:.2f}s "
        f"kdisp={T['kdisp']:.2f}s ({T['n_kdisp']} dispatches) "
        f"exact={T['exact']:.2f}s [build={T['build']:.2f}s "
        f"fill={T['fill']:.2f}s ({T['n_fill_rows']} strip-rows, "
        f"{T['n_flush']} flushes) finish={T['finish']:.2f}s "
        f"({T['n_pairs']} pairs)] write={T['write']:.2f}s",
        flush=True,
    )
