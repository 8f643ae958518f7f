import pathlib, sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from quaff_tpu.dp.engine import PairBatch, device_batch
from quaff_tpu.dp.pallas_v2 import V2Tables, scores_v2_device
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import make_envelope
from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
from quaff_tpu.model.params import default_params
data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
y = read_fast_seqs(str(data/"c8f30.fastq.gz"))[0]
x = read_fast_seqs(str(data/"c8f30.fastq.gz"))[0]; x.qual=""
params = default_params(); tables = ScoreTables.from_params(params)
env = make_envelope(x, KmerIndex(y,6), kmer_threshold=14, cell_size=24)
v2tab = V2Tables(tables)
bs = 2048
batch = PairBatch.build_packed([(x,y,env)]*bs, tables)
bdev = device_batch(batch)
ref = None
for rps in (1,2,4,8):
    variants=[]
    for i in range(4):
        b=dict(bdev)
        b["y_qual"]=bdev["y_qual"].at[:,i].set((bdev["y_qual"][:,i]+1)%40)
        variants.append(b)
    jax.block_until_ready([v["y_qual"] for v in variants])
    s0 = scores_v2_device(tables, v2tab, variants[0], rows_per_step=rps)
    if ref is None: ref = s0
    else: assert np.allclose(s0, ref, atol=1e-4), f"rps={rps} scores differ!"
    ts=[]
    for i in range(1,4):
        t0=time.perf_counter()
        scores_v2_device(tables, v2tab, variants[i], rows_per_step=rps)
        ts.append(time.perf_counter()-t0)
    dt=float(np.median(ts))
    print(f"rps={rps}: {dt*1e3:.1f} ms, {env.num_cells*bs/dt/1e9:.2f} Gcells/s", flush=True)
