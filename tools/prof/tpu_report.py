"""One-process TPU performance report: run every key measurement in a
single long-lived process so the remote compiler's per-process Pallas
recompiles are paid once, not per script.

Usage: python tools/prof/tpu_report.py [n_reads]
Covers: v2 viterbi fill (bench config), E-step fwd_store/bwd_counts
split timings, EM iteration steady state, align pipeline, all-vs-all
overlap.  Prints a summary table at the end.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import time
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
results = []


def report(name, seconds, extra=""):
    results.append((name, seconds, extra))
    print(f"[{name}] {seconds*1e3:.1f} ms {extra}", flush=True)


import os

import jax

if os.environ.get("QUAFF_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["QUAFF_TPU_PLATFORM"])
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq, KmerIndex
from quaff_tpu.model.params import default_params, QuaffNullParams
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables
from quaff_tpu.dp.pallas_v2 import V2Tables, scores_v2_device
from quaff_tpu.envelope import make_envelope
from quaff_tpu.aligner import DPConfig, QuaffAligner, VITERBI_CELL_SIZE

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
# off-TPU (smoke mode): interpret-mode kernels are slow — shrink the
# workload so the script stays runnable as an API check
SMOKE = jax.default_backend() != "tpu"
if SMOKE:
    print("(smoke mode: CPU backend, tiny shapes)", flush=True)
    base.seq, base.qual = base.seq[:400], base.qual[:400]
    N = min(N, 2)
rng = np.random.default_rng(0)
L = len(base.seq)

# ---- 1. bench-config v2 fill (B=256 packed strips; TPU only) ----
params = default_params()
tables = ScoreTables.from_params(params)
v2tab = V2Tables(tables)
if not SMOKE:
    y = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    x = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    x.qual = ""
    env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=14, cell_size=24)
    B = 256
    batch = PairBatch.build_packed([(x, y, env)] * B, tables)
    bdev = device_batch(batch)
    variants = []
    for i in range(4):
        b = dict(bdev)
        b["y_qual"] = bdev["y_qual"].at[:, i].set(
            (bdev["y_qual"][:, i] + 1) % 40
        )
        variants.append(b)
    jax.block_until_ready([b["y_qual"] for b in variants])
    np.asarray(scores_v2_device(tables, v2tab, bdev))  # compile
    times = []
    for b in variants:
        t0 = time.perf_counter()
        np.asarray(scores_v2_device(tables, v2tab, b))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    cells = env.num_cells * B
    report("v2 fill B=256", dt, f"{cells/dt/1e9:.2f} Gcells/s")

# ---- 2. E-step kernels split (fwd_store vs bwd_counts) ----
from quaff_tpu.dp import pallas_counts as pc
from quaff_tpu.dp.pallas_v2 import _prepare_device, _round_up, K_OLDTOK0

reads = []
for i in range(N):
    s0 = int(rng.integers(0, L // 2)); ln = int(rng.integers(L // 4, L // 2))
    seq = list(base.seq[s0:s0+ln]); qual = list(base.qual[s0:s0+ln])
    for _ in range(int(len(seq)*0.05)):
        p = int(rng.integers(0, len(seq))); seq[p] = "acgt"[int(rng.integers(0,4))]
    reads.append(FastSeq(name=f"r{i}", seq="".join(seq), qual="".join(qual)))
ref = FastSeq(name="ref", seq=base.seq)
config = DPConfig()
from quaff_tpu.aligner import FWDBACK_CELL_SIZE

yv = reads[0]
envp = config.make_envelope(ref, KmerIndex(yv, config.kmer_len), FWDBACK_CELL_SIZE)
wb = PairBatch.build_packed([(ref, yv, envp)] * 32, tables)
wdev = device_batch(wb)
W = _round_up(max(int(wb.member.shape[1]), 128), 128)
Bp = _round_up(32, 8)
Ly = int(wdev["y_tok"].shape[1])
Ki = params.num_indel_kmers
keys, xs0, meta, member_f, doff, snew, sold = _prepare_device({}, wdev, W, Bp)
meta = meta.at[3:7, :].set(
    jnp.broadcast_to(jnp.asarray(v2tab.trans, jnp.float32)[:, None], (4, Bp))
)
oldtoks, xsl = pc._prepare_bwd_extras(wdev, W, Bp)
n_segs = int(wdev["seg_d_lo"].shape[1]) if "seg_d_lo" in wdev else 1
for k in range(n_segs):
    keys = keys.at[:, K_OLDTOK0 + k, :].set(oldtoks[k])
interp = jax.default_backend() != "tpu"
kw = dict(width=W, b_pad=Bp, n_rows=Ly, local=True, n_segs=n_segs,
          n_ik=Ki, interpret=interp)
# DISTINCT inputs per timed run: the axon runtime caches identical
# executions (CLAUDE.md), so the warm run perturbs the transition rows
metas = [
    meta.at[3, :].add(1e-6 * (i + 1)) for i in range(2)
]
args_f = lambda m: (keys, v2tab.emis, v2tab.insv, v2tab.ik, member_f,
                    xs0, m, doff, snew)
out, mrows, irows, drows = pc._fwd_store(*args_f(meta), **kw)
np.asarray(out)  # compile + fence
t0 = time.perf_counter()
out, mrows, irows, drows = pc._fwd_store(*args_f(metas[0]), **kw)
np.asarray(out)
report(f"fwd_store B=32 W={W} rows={Ly}", time.perf_counter() - t0)
wrow = jnp.zeros((8, Bp), jnp.float32).at[0, :32].set(1.0).at[1, :32].set(0.0)
args_b = lambda m: (keys, v2tab.emis, v2tab.insv, v2tab.ik, member_f,
                    xsl, m, doff, sold, wrow, mrows, irows, drows)
d = pc._bwd_counts(*args_b(meta), **kw)
np.asarray(d[0])
t0 = time.perf_counter()
d = pc._bwd_counts(*args_b(metas[1]), **kw)
np.asarray(d[0])
report(f"bwd_counts B=32 W={W} rows={Ly}", time.perf_counter() - t0)

# ---- 3. EM iteration steady state ----
from quaff_tpu.trainer import QuaffCounter

null = QuaffNullParams.fit(reads)
sort_order = [[0] for _ in reads]


def perturb(rs, i):
    """Distinct pipeline inputs per timed run (execution-cache defeat):
    bump one quality character of each read."""
    out = []
    for r in rs:
        q = list(r.qual)
        q[i] = chr(33 + ((ord(q[i]) - 33 + 1) % 40))
        out.append(FastSeq(name=r.name, seq=r.seq, qual="".join(q)))
    return out


counter = QuaffCounter(params, null, config, True)
counts, ll, so = counter.get_counts([ref], reads, sort_order)  # warm
for it in range(2):
    rs = perturb(reads, it)
    t0 = time.perf_counter()
    counter = QuaffCounter(params, null, config, True)
    counts, ll, so = counter.get_counts([ref], rs, sort_order)
    report(f"E-step iter{it} N={N}", time.perf_counter() - t0,
           f"loglike={ll:.1f}")

# ---- 4. align pipeline ----
import io

from quaff_tpu.formats.alignment import AlignmentPrinter

aligner = QuaffAligner(params, null, config)
printer = AlignmentPrinter()
printer.log_odds_threshold = float("-inf")
aligner.align_all(io.StringIO(), [ref], reads, printer)  # warm
t0 = time.perf_counter()
buf = io.StringIO()
aligner.align_all(buf, [ref], perturb(reads, 2), printer)
report(f"align N={N}", time.perf_counter() - t0,
       f"{buf.getvalue().count('# STOCKHOLM')} hits")

# ---- 5. all-vs-all overlap ----
from quaff_tpu.io.fastseq import add_revcomps
from quaff_tpu.overlap import QuaffOverlapAligner

ov = QuaffOverlapAligner(params, null, config)
t0 = time.perf_counter()
buf = io.StringIO()
ov.align_all(buf, add_revcomps(reads), len(reads), printer)
report(f"overlap all-vs-all N={N} (cold)", time.perf_counter() - t0,
       f"{buf.getvalue().count('# STOCKHOLM')} alignments")
t0 = time.perf_counter()
ov.align_all(io.StringIO(), add_revcomps(perturb(reads, 3)), len(reads),
             printer)
report(f"overlap all-vs-all N={N} (warm)", time.perf_counter() - t0)

print("\n==== summary ====")
for name, s, extra in results:
    print(f"{name:36s} {s*1e3:9.1f} ms  {extra}")
