import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import time, sys
import numpy as np
from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq
from quaff_tpu.trainer import QuaffTrainer, QuaffCounter
from quaff_tpu.model.params import default_params, QuaffNullParams
from quaff_tpu.aligner import DPConfig

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
config = DPConfig()
sort_order = [[0] for _ in reads]
print("setup done", flush=True)
for it in range(3):
    t0 = time.perf_counter()
    counter = QuaffCounter(params, null, config, True)
    counts, ll, so = counter.get_counts([ref], reads, sort_order)
    print(f"E-step iter{it} wall={time.perf_counter()-t0:.2f}s loglike={ll:.2f}", flush=True)
