"""Probe E-step (fwd_store/bwd_counts) and overlap kernel shapes against
the raised Mosaic VMEM ceiling: compile + time a matrix of (B, W) points
so the pipeline batch caps can be set from measurements, not guesses.

Usage: python tools/prof/vmem_tune.py [estep|overlap|all]
Run ONE instance at a time (single tunneled TPU).
"""
import sys, pathlib, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

MODE = sys.argv[1] if len(sys.argv) > 1 else "all"
print("devices:", jax.devices(), flush=True)

from quaff_tpu.io.fastseq import read_fast_seqs, FastSeq, KmerIndex
from quaff_tpu.model.params import default_params
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.dp.engine import PairBatch, device_batch
from quaff_tpu.dp.pallas_v2 import (
    V2Tables, _prepare_device, _round_up, K_OLDTOK0,
)
from quaff_tpu.envelope import make_envelope
from quaff_tpu.aligner import DPConfig, FWDBACK_CELL_SIZE

data = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"
base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
params = default_params()
tables = ScoreTables.from_params(params)
v2tab = V2Tables(tables)
config = DPConfig()
interp = jax.default_backend() != "tpu"

rng = np.random.default_rng(0)


def mutate(seq, frac=0.05):
    s = list(seq)
    for _ in range(int(len(s) * frac)):
        p = int(rng.integers(0, len(s)))
        s[p] = "acgt"[int(rng.integers(0, 4))]
    return "".join(s)


def estep_point(B, read_len):
    """Compile+time one fwd_store/bwd_counts dispatch at batch B with
    reads of ~read_len bases (envelope width follows the read)."""
    from quaff_tpu.dp import pallas_counts as pc

    y = FastSeq(
        name="y",
        seq=mutate(base.seq[:read_len]),
        qual=base.qual[:read_len],
    )
    ref = FastSeq(name="ref", seq=base.seq)
    envp = config.make_envelope(
        ref, KmerIndex(y, config.kmer_len), FWDBACK_CELL_SIZE
    )
    wb = PairBatch.build_packed([(ref, y, envp)] * B, tables)
    wdev = device_batch(wb)
    W = _round_up(max(int(wb.member.shape[1]), 128), 128)
    Bp = _round_up(B, 8)
    Ly = int(wdev["y_tok"].shape[1])
    Ki = params.num_indel_kmers
    keys, xs0, meta, member_f, doff, snew, sold = _prepare_device(
        {}, wdev, W, Bp
    )
    meta = meta.at[3:7, :].set(
        jnp.broadcast_to(
            jnp.asarray(v2tab.trans, jnp.float32)[:, None], (4, Bp)
        )
    )
    oldtoks, xsl = pc._prepare_bwd_extras(wdev, W, Bp)
    n_segs = int(wdev["seg_d_lo"].shape[1]) if "seg_d_lo" in wdev else 1
    for k in range(n_segs):
        keys = keys.at[:, K_OLDTOK0 + k, :].set(oldtoks[k])
    kw = dict(width=W, b_pad=Bp, n_rows=Ly, local=True, n_segs=n_segs,
              n_ik=Ki, interpret=interp)
    metas = [meta.at[3, :].add(1e-6 * (i + 1)) for i in range(2)]
    label = f"B={B} W={W} rows={Ly}"
    try:
        args_f = lambda m: (keys, v2tab.emis, v2tab.insv, v2tab.ik,
                            member_f, xs0, m, doff, snew)
        out, mrows, irows, drows = pc._fwd_store(*args_f(meta), **kw)
        np.asarray(out)
        t0 = time.perf_counter()
        out, mrows, irows, drows = pc._fwd_store(*args_f(metas[0]), **kw)
        np.asarray(out)
        tf = time.perf_counter() - t0
        wrow = (jnp.zeros((8, Bp), jnp.float32)
                .at[0, :B].set(1.0).at[1, :B].set(0.0))
        args_b = lambda m: (keys, v2tab.emis, v2tab.insv, v2tab.ik,
                            member_f, xsl, m, doff, sold, wrow,
                            mrows, irows, drows)
        d = pc._bwd_counts(*args_b(meta), **kw)
        np.asarray(d[0])
        t0 = time.perf_counter()
        d = pc._bwd_counts(*args_b(metas[1]), **kw)
        np.asarray(d[0])
        tb = time.perf_counter() - t0
        cells = Bp * W * Ly
        print(f"[estep {label}] fwd {tf*1e3:8.1f} ms  bwd {tb*1e3:8.1f} ms"
              f"  {cells/(tf+tb)/1e9:6.2f} Gcells/s", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"[estep {label}] FAILED: {type(e).__name__}: {msg}",
              flush=True)


def overlap_sweep(n_reads, vmem_cells):
    """Time the all-vs-all overlap pipeline at a given
    QUAFF_OV_VMEM_CELLS budget (cap applied inside _align_all_batched)."""
    import io, os

    from quaff_tpu.io.fastseq import add_revcomps
    from quaff_tpu.model.params import QuaffNullParams
    from quaff_tpu.overlap import QuaffOverlapAligner
    from quaff_tpu.formats.alignment import AlignmentPrinter

    os.environ["QUAFF_OV_VMEM_CELLS"] = str(vmem_cells)
    reads = []
    for i in range(n_reads):
        s0 = int(rng.integers(0, len(base.seq) // 2))
        ln = int(rng.integers(len(base.seq) // 4, len(base.seq) // 2))
        reads.append(FastSeq(
            name=f"r{vmem_cells}_{i}",
            seq=mutate(base.seq[s0:s0 + ln]),
            qual=base.qual[s0:s0 + ln],
        ))
    null = QuaffNullParams.fit(reads)
    ov = QuaffOverlapAligner(params, null, config)
    printer = AlignmentPrinter()
    printer.log_odds_threshold = float("-inf")
    buf = io.StringIO()
    t0 = time.perf_counter()
    ov.align_all(buf, add_revcomps(reads), len(reads), printer)
    dt = time.perf_counter() - t0
    print(f"[overlap N={n_reads} cells={vmem_cells}] {dt*1e3:9.1f} ms  "
          f"{buf.getvalue().count('# STOCKHOLM')} alignments", flush=True)


if MODE in ("estep", "all"):
    for B, rl in [(32, 3072), (256, 3072), (512, 3072),
                  (256, 512), (1024, 512), (2048, 512)]:
        estep_point(B, rl)

if MODE == "points":  # explicit B:read_len pairs from argv
    for spec in sys.argv[2:]:
        B, rl = (int(v) for v in spec.split(":"))
        estep_point(B, rl)

if MODE in ("overlap", "all"):
    for cells in [96 * 1024, 256 * 1024, 512 * 1024]:
        try:
            overlap_sweep(16, cells)
        except Exception as e:
            print(f"[overlap cells={cells}] FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
