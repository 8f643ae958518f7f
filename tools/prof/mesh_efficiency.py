"""Weak-scaling efficiency of the sharded E-step / align paths on a
virtual CPU device mesh.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python tools/prof/mesh_efficiency.py

Weak scaling: D devices process D x (reads per device) — ideal wall is
FLAT, so efficiency_D = T_1 / T_D.  The host has 4 cores, so D <= 4
keeps one core per virtual device and the measurement isolates the
sharding overhead (collectives + padding + shard_map plumbing) rather
than core oversubscription.  The XLA engine E-step carries the same
psum/allgather structure as the production kernel E-step
(parallel/estep.py: identical count_fields psum tree), so its measured
overhead is the sharding-cost proxy for both.

Also prints the per-step collective payload (the psum'd count pytree),
for the ICI argument: on real TPU hardware the same payload rides ICI
at ~10-100 GB/s, so the collective cost stays microseconds against
E-step compute of ~0.1-3 s per iteration (CLAUDE.md scale points).
"""
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the probe compiles ~15 distinct sharded
# programs (3 variants x 3 mesh sizes x 2 paths) — cold that exceeds
# the whole measurement wall
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from quaff_tpu.aligner import DPConfig, FWDBACK_CELL_SIZE
from quaff_tpu.alphabet import DNA_ALPHABET
from quaff_tpu.dp.engine import device_tables
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.io.fastseq import FastSeq
from quaff_tpu.model.params import default_params
from quaff_tpu.parallel.estep import (
    build_pair_grid,
    gather_scores,
    sharded_align_engine,
    sharded_estep,
)

READS_PER_DEV = int(os.environ.get("QUAFF_MESH_EFF_READS", "16"))
READ_LEN = 400
REF_LEN = 1200

rng = np.random.default_rng(5)
params = default_params()
tables = ScoreTables.from_params(params)
tdev = device_tables(tables)
config = DPConfig(kmer_threshold=10)

ref_seq = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, REF_LEN))
refs = [FastSeq(name="ref", seq=ref_seq)]


def make_reads(n, salt):
    reads = []
    for i in range(n):
        s0 = int(rng.integers(0, REF_LEN - READ_LEN))
        toks = [
            int(rng.integers(0, 4)) if rng.random() < 0.05
            else DNA_ALPHABET.index(c)
            for c in ref_seq[s0 : s0 + READ_LEN]
        ]
        seq = "".join(DNA_ALPHABET[t] for t in toks)
        qual = "".join(
            chr(33 + int(q)) for q in rng.integers(5, 30, READ_LEN)
        )
        reads.append(FastSeq(name=f"r{salt}_{i}", seq=seq, qual=qual))
    return reads


def time_estep(D, identical=False, fetch=True):
    """Weak-scaling E-step wall at D devices — same decomposition
    columns as time_align: identical=True replicates ONE shard's reads
    to every device (isolates sharding machinery from load imbalance);
    fetch=False keeps the psum'd counts device-resident (isolates the
    device phase from the host gather)."""
    mesh = Mesh(np.array(jax.devices()[:D]).reshape(D, 1), ("dp", "mp"))
    if identical:
        shard_reads = make_reads(READS_PER_DEV, 20)
        reads = shard_reads * D
    else:
        reads = make_reads(D * READS_PER_DEV, D)
    grid, _ = build_pair_grid(refs, reads, tables, config, FWDBACK_CELL_SIZE)
    null_ll = jnp.full((len(reads),), -1e30, jnp.float32)

    def run():
        counts, ll, _ = sharded_estep(
            mesh, tdev, grid, null_ll, local=True, dtype=jnp.float32,
            num_match_kmers=params.num_match_kmers,
            num_indel_kmers=params.num_indel_kmers,
        )
        if fetch:
            jax.block_until_ready(counts)
            return counts, float(ll)
        jax.block_until_ready(counts)
        return counts, None

    counts, _ = run()  # compile
    payload = sum(np.asarray(v).nbytes for v in counts.values())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)), payload


def time_align(D, identical=False, fetch=True):
    """Weak-scaling align wall at D devices.

    identical=True replicates ONE shard's reads to every device, so all
    shards do the same work: the efficiency then isolates the sharding
    machinery (dispatch + runtime scheduling + fetch) from LOAD
    IMBALANCE — with random reads the mesh wall is the max over D
    different shard walls while t(1) is a single shard's wall, so
    max-vs-mean skew reads as false inefficiency.  fetch=False skips the
    host gather (scores stay device-resident), isolating the device
    phase."""
    mesh = Mesh(np.array(jax.devices()[:D]).reshape(D, 1), ("dp", "mp"))
    if identical:
        shard_reads = make_reads(READS_PER_DEV, 10)
        reads = shard_reads * D
    else:
        reads = make_reads(D * READS_PER_DEV, 10 + D)
    grid, _ = build_pair_grid(
        refs, reads, tables, config, FWDBACK_CELL_SIZE
    )
    # [D, B, ...] stacking: one chunk of READS_PER_DEV pairs per device
    stacked = {
        k: jnp.reshape(
            v, (D, READS_PER_DEV) + tuple(v.shape[2:])
        )
        for k, v in grid.items()
    }

    def run():
        s = sharded_align_engine(
            mesh, tdev, stacked, mode="viterbi", local=True,
            dtype=jnp.float32,
        )
        if fetch:
            return gather_scores(s)
        jax.block_until_ready(s)
        return s

    run()  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def contention_probe(D):
    """The host-side-contention control: D INDEPENDENT single-device
    processes each run the D=1 align workload concurrently (no mesh, no
    collectives, each pinned to its own core).  If their wall degrades
    like the mesh's, the mesh's weak-scaling loss is host-core
    contention (a virtual-CPU-mesh artifact), not sharding overhead."""
    import subprocess

    child = (
        "import os,sys,time,pathlib\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=1'\n"
        "import jax\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "import tools.prof.mesh_efficiency as me\n"
        "t = me.%s(1, identical=True)%s\n"
        "print('CHILD_WALL', t)\n"
    ) % (
        str(pathlib.Path(__file__).resolve().parents[2]),
        os.environ.get("QUAFF_MESH_EFF_CONTROL", "time_align"),
        "[0]" if os.environ.get(
            "QUAFF_MESH_EFF_CONTROL", "time_align"
        ) == "time_estep" else "",
    )
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", child],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            cwd=str(pathlib.Path(__file__).resolve().parents[2]),
        )
        for i in range(D)
    ]
    walls = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        for line in out.decode().splitlines():
            if line.startswith("CHILD_WALL"):
                walls.append(float(line.split()[1]))
    return max(walls) if walls else float("nan")


def main():
    n_dev = len(jax.devices())
    print(f"virtual CPU devices: {n_dev}, host cores: {os.cpu_count()}, "
          f"reads/device: {READS_PER_DEV}")
    ds = [d for d in (1, 2, 4) if d <= n_dev]
    for label, kw in (
        ("E-step (random shards, fetch)   ", {}),
        ("E-step (identical shards, fetch)", {"identical": True}),
        ("E-step (identical, device-only) ", {"identical": True,
                                              "fetch": False}),
    ):
        t1 = None
        for D in ds:
            t, payload = time_estep(D, **kw)
            if D == 1:
                t1 = t
            eff = t1 / t
            print(f"{label} D={D}: {t:.3f}s  weak-scaling "
                  f"eff={eff*100:.0f}%  "
                  f"(psum payload {payload/1024:.0f} KiB)")
    for label, kw in (
        ("align (random shards, fetch)   ", {}),
        ("align (identical shards, fetch)", {"identical": True}),
        ("align (identical, device-only) ", {"identical": True,
                                             "fetch": False}),
    ):
        t1 = None
        for D in ds:
            t = time_align(D, **kw)
            if D == 1:
                t1 = t
            eff = t1 / t
            print(f"{label} D={D}: {t:.3f}s  "
                  f"weak-scaling eff={eff*100:.0f}%")
    if os.environ.get("QUAFF_MESH_EFF_CONTENTION"):
        t1 = contention_probe(1)
        for D in ds:
            t = contention_probe(D)
            print(f"contention control (D procs, no mesh) D={D}: "
                  f"{t:.3f}s  eff={t1 / t * 100:.0f}%")


if __name__ == "__main__":
    main()
