"""Break down the align pipeline's HOST-side cost per read on the bench
config (full-length c8f30 reads vs the c8f30 ref): phase A envelope prep,
phase C winner prep/fill/traceback/output.  Runs on CPU — phase B device
scoring is excluded (measured separately on hardware by align_throughput).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import io, time
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq, KmerIndex
from quaff_tpu.aligner import QuaffAligner, DPConfig, VITERBI_CELL_SIZE
from quaff_tpu.envelope import pack_strips
from quaff_tpu.model.params import default_params, QuaffNullParams
from quaff_tpu.formats.alignment import AlignmentPrinter
from quaff_tpu.dp.engine import PairBatch
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.dp.traceback import viterbi_traceback
from quaff_tpu import native

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
ref = FastSeq(name="ref", seq=base.seq)
reads = []
for i in range(N):
    q = base.qual
    j = i % len(q)
    q = q[:j] + chr(33 + (ord(q[j]) - 33 + 1) % 40) + q[j + 1:]
    reads.append(FastSeq(name=f"r{i}", seq=base.seq, qual=q))

params = default_params()
null = QuaffNullParams.fit(reads)
tables = ScoreTables.from_params(params)
config = DPConfig(kmer_threshold=14)
native.get_lib(auto_build=True)
print("native:", native.available())

def t(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn()
        best = min(best, time.perf_counter() - t0)
    return best, r

# phase A: kmer index + envelope, per read
dt, _ = t(lambda: [KmerIndex(y, 6) for y in reads])
print(f"A.kmer_index : {dt/N*1e3:7.2f} ms/read")
idxs = [KmerIndex(y, 6) for y in reads]
dt, envs = t(lambda: [config.make_envelope(ref, ix, VITERBI_CELL_SIZE) for ix in idxs])
print(f"A.envelope   : {dt/N*1e3:7.2f} ms/read")

# phase C: strips -> PairBatch.build -> native fill (matrices) -> traceback
dt, strip_lists = t(lambda: [pack_strips(e, 3) for e in envs])
print(f"C.pack_strips: {dt/N*1e3:7.2f} ms/read")
entries = [(ref, y, s) for y, ss in zip(reads, strip_lists) for s in ss]
n_strips = len(entries)
print(f"  strips/read: {n_strips/N:.2f}  widths: {[s.band_width for s in strip_lists[0]]} rows={len(reads[0].seq)+1}")
dt, wbatch = t(lambda: PairBatch.build(entries, tables))
print(f"C.build      : {dt/N*1e3:7.2f} ms/read  (padded W={wbatch.width} rows={wbatch.max_y_len+1})")
dt, res = t(lambda: native.align_fill_native(wbatch, tables, mode="viterbi", local=True))
print(f"C.fill_f64   : {dt/N*1e3:7.2f} ms/read")

def walk():
    out = []
    b = 0
    for y, ss in zip(reads, strip_lists):
        best_b = b; best_sc = float(res["score"][b])
        for k in range(1, len(ss)):
            if float(res["score"][b+k]) > best_sc:
                best_b, best_sc = b+k, float(res["score"][b+k])
        out.append(viterbi_traceback(ref, y, ss[best_b-b], tables,
                   res["mat"][best_b], res["ins"][best_b], res["del"][best_b],
                   best_sc, local=True))
        b += len(ss)
    return out
dt, aligns = t(walk)
print(f"C.traceback  : {dt/N*1e3:7.2f} ms/read")

printer = AlignmentPrinter(); printer.log_odds_threshold = float("-inf")
def emit():
    out = io.StringIO()
    for a in aligns:
        printer.write_alignment(out, a)
    return out.getvalue()
dt, txt = t(emit)
print(f"C.output     : {dt/N*1e3:7.2f} ms/read  ({len(txt)} chars)")

dt, _ = t(lambda: [null.log_likelihood(y) for y in reads])
print(f"C.null_ll    : {dt/N*1e3:7.2f} ms/read")
