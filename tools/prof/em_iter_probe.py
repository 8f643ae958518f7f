import sys, pathlib, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np
import bench
from quaff_tpu.aligner import DPConfig
from quaff_tpu.model.params import QuaffNullParams, QuaffParamCounts, default_params
from quaff_tpu.trainer import QuaffCounter
from quaff_tpu.io.fastseq import read_fast_seqs

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
ref = read_fast_seqs(str(data/"c8f30.fastq.gz"))[0]; ref.qual = ""
refs=[ref]; params=default_params(); config=DPConfig(kmer_threshold=14)
n=int(__import__("sys").argv[1]) if len(__import__("sys").argv)>1 else 8
reads0 = bench._perturbed_reads(data, n, 0)
null = QuaffNullParams.fit(reads0)
order=[list(range(1)) for _ in reads0]
counter=QuaffCounter(params, null, config, True)
t0=time.perf_counter()
counter.get_counts(refs, reads0, order)  # warm
print(f"cold first E-step (fresh process): {time.perf_counter()-t0:.1f}s")
qp=params; times=[]
for salt in (4,5,6,7):
    reads=bench._perturbed_reads(data, n, salt)
    counter=QuaffCounter(qp, null, config, True)
    t0=time.perf_counter()
    counts, ll, o2 = counter.get_counts(refs, reads, [list(range(1)) for _ in reads])
    cwp=QuaffParamCounts.zero(qp.match_kmer_len, qp.indel_kmer_len)
    cwp.add_weighted(counts,1.0); qp=cwp.fit()
    times.append(time.perf_counter()-t0)
print("em iters:", [f"{t:.3f}" for t in times], "median", f"{float(np.median(times)):.4f}")
