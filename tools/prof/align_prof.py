import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import io, time, sys
import numpy as np
from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq
from quaff_tpu.aligner import QuaffAligner, DPConfig
import quaff_tpu.aligner as amod
from quaff_tpu.model.params import default_params, QuaffNullParams
from quaff_tpu.formats.alignment import AlignmentPrinter

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
base = read_fast_seqs("tests/data/c8f30.fastq.gz")[0]
rng = np.random.default_rng(0)
L = len(base.seq)
ref = FastSeq(name="ref", seq=base.seq)
reads = []
for i in range(N):
    s0 = int(rng.integers(0, L // 2)); ln = int(rng.integers(L // 4, L // 2))
    seq = list(base.seq[s0:s0+ln]); qual = list(base.qual[s0:s0+ln])
    for _ in range(int(len(seq)*0.05)):
        p = int(rng.integers(0, len(seq))); seq[p] = "acgt"[int(rng.integers(0,4))]
    reads.append(FastSeq(name=f"r{i}", seq="".join(seq), qual="".join(qual)))
params = default_params(); null = QuaffNullParams.fit(reads)
alg = QuaffAligner(params, null, DPConfig())
printer = AlignmentPrinter()

# instrument: time phase-B kernel calls and phase-C winner refills
from quaff_tpu.dp import pallas_v2
orig_sc = pallas_v2.scores_v2_device
t_sc = [0.0, 0]
def timed_sc(*a, **kw):
    t0 = time.perf_counter(); r = orig_sc(*a, **kw); np.asarray(r)
    t_sc[0] += time.perf_counter() - t0; t_sc[1] += 1
    return r
amod.__dict__.setdefault("_x", None)
import quaff_tpu.dp.pallas_v2 as pv2
pv2.scores_v2_device = timed_sc

orig_fill = amod.dp_fill
t_fill = [0.0, 0]
def timed_fill(*a, **kw):
    t0 = time.perf_counter(); r = orig_fill(*a, **kw)
    for v in r.values(): np.asarray(v)
    t_fill[0] += time.perf_counter() - t0; t_fill[1] += 1
    return r
amod.dp_fill = timed_fill

from quaff_tpu.dp import traceback as tbmod
orig_tb = amod.viterbi_traceback
t_tb = [0.0]
def timed_tb(*a, **kw):
    t0 = time.perf_counter(); r = orig_tb(*a, **kw)
    t_tb[0] += time.perf_counter() - t0
    return r
amod.viterbi_traceback = timed_tb

print("setup done", flush=True)
for it in range(3):
    t_sc[0]=0; t_sc[1]=0; t_fill[0]=0; t_fill[1]=0; t_tb[0]=0
    out = io.StringIO(); t0 = time.perf_counter()
    alg.align_all(out, [ref], reads, printer)
    w = time.perf_counter()-t0
    print(f"iter{it} wall={w:.2f}s kernel={t_sc[0]:.2f}s/{t_sc[1]} "
          f"winner_fill={t_fill[0]:.2f}s/{t_fill[1]} tb={t_tb[0]:.2f}s "
          f"other={w-t_sc[0]-t_fill[0]-t_tb[0]:.2f}s lines={out.getvalue().count(chr(10))}", flush=True)
