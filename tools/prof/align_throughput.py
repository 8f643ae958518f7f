import sys, pathlib, time, io
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np
import bench
from quaff_tpu.aligner import DPConfig, QuaffAligner
from quaff_tpu.formats.alignment import AlignmentPrinter
from quaff_tpu.io.fastseq import read_fast_seqs
from quaff_tpu.model.params import QuaffNullParams, default_params
data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
ref = read_fast_seqs(str(data/"c8f30.fastq.gz"))[0]; ref.qual = ""
n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
reads0 = bench._perturbed_reads(data, n, 0)
null = QuaffNullParams.fit(reads0)
printer = AlignmentPrinter(); printer.log_odds_threshold = float("-inf")
aligner = QuaffAligner(default_params(), null, DPConfig(kmer_threshold=14, threads=4))
aligner.align_all(io.StringIO(), [ref], reads0, printer)
ts=[]
for salt in (1,2,3):
    reads = bench._perturbed_reads(data, n, salt)
    out = io.StringIO()
    t0=time.perf_counter(); aligner.align_all(out, [ref], reads, printer)
    ts.append(time.perf_counter()-t0)
    assert "Score" in out.getvalue()
dt=float(np.median(ts))
print(f"align {n} reads: {dt:.3f}s = {n/dt:.1f} reads/s")
