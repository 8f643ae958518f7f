"""Measure overlap_fill CPU f64 cost vs batch size and padding."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import time, pathlib, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq, KmerIndex
from quaff_tpu.model.params import default_params
from quaff_tpu.dp.overlap import OverlapScoreTables, overlap_device_tables, overlap_fill
from quaff_tpu.overlap import OverlapBatch
from quaff_tpu.aligner import DPConfig, VITERBI_CELL_SIZE
import jax.numpy as jnp

data = pathlib.Path("tests/data")
base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
rng = np.random.default_rng(0)
L = len(base.seq)
reads = []
for i in range(8):
    s0 = int(rng.integers(0, L // 2))
    ln = int(rng.integers(L // 3, L // 2))
    seq = list(base.seq[s0 : s0 + ln])
    qual = list(base.qual[s0 : s0 + ln])
    for _ in range(int(len(seq) * 0.05)):
        p = int(rng.integers(0, len(seq)))
        seq[p] = "acgt"[int(rng.integers(0, 4))]
    reads.append(FastSeq(name=f"r{i}", seq="".join(seq), qual="".join(qual)))

params = default_params()
tables = OverlapScoreTables.from_params(params, False)
tdev = overlap_device_tables(tables)
config = DPConfig()

pairs = []
for i in range(6):
    x, y = reads[i], reads[(i + 1) % 8]
    env = config.make_envelope(x, KmerIndex(y, config.kmer_len), VITERBI_CELL_SIZE)
    pairs.append((x, y, env))

def run(ob, tag):
    t0 = time.perf_counter()
    res = overlap_fill(tdev, ob.device(), return_matrices=True, dtype=jnp.float64)
    jax.block_until_ready(res)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = overlap_fill(tdev, ob.device(), return_matrices=True, dtype=jnp.float64)
    jax.block_until_ready(res)
    t_warm = time.perf_counter() - t0
    print(f"{tag}: cold={t_cold:.2f}s warm={t_warm:.2f}s", flush=True)

def round_up(v, m):
    return ((v + m - 1) // m) * m

# exact per-pair shapes
for p in pairs[:2]:
    env = p[2]
    run(OverlapBatch([p], tables), f"B=1 exact W={env.band_width} Ly={len(p[1].seq)}")

wp = round_up(max(e.band_width for *_, e in pairs), 64)
lyp = round_up(max(len(y.seq) for _, y, _ in pairs), 512)
lxp = round_up(max(len(x.seq) for x, _, _ in pairs), 512)
run(OverlapBatch([pairs[0]], tables, width=wp, max_y_len=lyp, max_x_len=lxp),
    f"B=1 padded W={wp} Ly={lyp}")
run(OverlapBatch(pairs, tables, width=wp, max_y_len=lyp, max_x_len=lxp),
    f"B=6 padded W={wp} Ly={lyp}")
