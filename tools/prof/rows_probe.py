"""Probe v2 kernel rows_per_step at the production bench config
(B=2048, packed c8f30 self-align): the recorded R>1 regression was
measured at B=32/W=512 under the old 16 MiB VMEM cap — re-check at the
current shape.  Run ONE instance at a time (single tunneled TPU).

Usage: python tools/prof/rows_probe.py [R ...]   (default: 1 2 4)
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

from quaff_tpu.dp.engine import PairBatch, device_batch
from quaff_tpu.dp.pallas_v2 import V2Tables, scores_v2_device
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import make_envelope
from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
from quaff_tpu.model.params import default_params

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
y = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
x = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
x.qual = ""

params = default_params()
tables = ScoreTables.from_params(params)
env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=14, cell_size=24)
B = 2048
batch = PairBatch.build_packed([(x, y, env)] * B, tables)
bdev = device_batch(batch)
v2tab = V2Tables(tables)
cells = env.num_cells * B

r_list = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
for R in r_list:
    variants = []
    for i in range(7):
        b = dict(bdev)
        b["y_qual"] = bdev["y_qual"].at[:, i].set((bdev["y_qual"][:, i] + 1) % 40)
        variants.append(b)
    jax.block_until_ready([b["y_qual"] for b in variants])
    t0 = time.perf_counter()
    s0 = scores_v2_device(tables, v2tab, bdev, rows_per_step=R)
    print(f"R={R}: compile+first {time.perf_counter() - t0:.1f}s "
          f"score {float(np.max(s0)):.2f}", flush=True)
    for i in range(2):
        np.asarray(scores_v2_device(tables, v2tab, variants[i],
                                    rows_per_step=R))
    ts = []
    for i in range(2, 7):
        t0 = time.perf_counter()
        np.asarray(scores_v2_device(tables, v2tab, variants[i],
                                    rows_per_step=R))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"R={R}: {dt * 1e3:.1f} ms -> {cells / dt / 1e9:.2f} Gcells/s",
          flush=True)
