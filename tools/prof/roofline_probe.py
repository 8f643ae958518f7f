"""Empirical roofline anchors for the banded-DP kernels.

Measures, on the attached TPU, in one process:
1. VPU speed-of-light for the kernel's dominant op mix — back-to-back
   dependent add+max chains on a VMEM-resident f32 block (2 vector
   ops/step), and roll+add chains (the lane-shift cost the in-row
   recursions pay), via minimal Pallas kernels with an unrolled inner
   loop.  The marginal cost per extra iteration isolates pure compute
   from dispatch/DMA.
2. The production v2 Viterbi fill rate across batch sizes at the bench
   shape (W=256), including the B=4096 point (known round-1 regression).
3. Per-row marginal cost: fill time vs grid rows at fixed (B, W) —
   slope = compute per row, intercept = dispatch overhead.

Usage: python tools/prof/roofline_probe.py
Feeds docs/roofline.md.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    B, W = 256, 256
    GRID = 512

    def time_device(fn, variants, n=3):
        np.asarray(fn(variants[0]))  # compile+warm
        ts = []
        for i in range(1, n + 1):
            t0 = time.perf_counter()
            np.asarray(fn(variants[i]))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def make_variants(k=4):
        rng = np.random.default_rng(7)
        return [
            (
                jnp.asarray(rng.standard_normal((B, W)), jnp.float32),
                jnp.asarray(rng.standard_normal((B, W)), jnp.float32),
            )
            for _ in range(k)
        ]

    def chain_kernel(iters, use_roll):
        def body(a_ref, b_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[:] = a_ref[:]

            x = o_ref[:]
            a = a_ref[:]
            b = b_ref[:]
            for _ in range(iters):
                if use_roll:
                    x = pltpu.roll(x, jnp.int32(1), 1) + a
                else:
                    x = jnp.maximum(x + a, b)
            o_ref[:] = x

        @jax.jit
        def run(ab):
            a, b = ab
            return pl.pallas_call(
                body,
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((B, W), lambda g: (0, 0)),
                    pl.BlockSpec((B, W), lambda g: (0, 0)),
                ],
                out_specs=pl.BlockSpec((B, W), lambda g: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
            )(a, b)

        return run

    lanes = B * W
    for name, use_roll in (("add+max", False), ("roll+add", True)):
        va = make_variants()
        t_lo = time_device(chain_kernel(64, use_roll), va)
        t_hi = time_device(chain_kernel(256, use_roll), va)
        marginal = (t_hi - t_lo) / (256 - 64) / GRID  # s per chain step
        ops = 2 * lanes
        print(
            f"[sol:{name}] {ops / marginal / 1e12:.3f} Tops/s "
            f"({marginal * 1e9:.2f} ns per [{B},{W}] step; "
            f"64it {t_lo*1e3:.1f}ms 256it {t_hi*1e3:.1f}ms)",
            flush=True,
        )

    # ---- production fill rate vs batch size ----
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
    v2tab = V2Tables(tables)
    cells = env.num_cells

    for bs in (512, 1024, 2048, 4096):
        batch = PairBatch.build_packed([(x, y, env)] * bs, tables)
        bdev = device_batch(batch)
        variants = []
        for i in range(4):
            b = dict(bdev)
            b["y_qual"] = bdev["y_qual"].at[:, i].set(
                (bdev["y_qual"][:, i] + 1) % 40
            )
            variants.append(b)
        jax.block_until_ready([v["y_qual"] for v in variants])
        dt = time_device(
            lambda b: scores_v2_device(tables, v2tab, b), variants
        )
        print(
            f"[fill B={bs}] {cells * bs / dt / 1e9:.2f} Gcells/s "
            f"({dt*1e3:.1f} ms)",
            flush=True,
        )

    # ---- per-row marginal cost at the bench shape ----
    bs = 2048
    for max_rows in (2048, 4096, 6656):
        yy = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
        yy.seq = yy.seq[:max_rows]
        yy.qual = yy.qual[:max_rows]
        xx = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
        xx.qual = ""
        env_r = make_envelope(
            xx, KmerIndex(yy, 6), kmer_threshold=14, cell_size=24
        )
        batch = PairBatch.build_packed([(xx, yy, env_r)] * bs, tables)
        bdev = device_batch(batch)
        variants = []
        for i in range(4):
            b = dict(bdev)
            b["y_qual"] = bdev["y_qual"].at[:, i].set(
                (bdev["y_qual"][:, i] + 1) % 40
            )
            variants.append(b)
        jax.block_until_ready([v["y_qual"] for v in variants])
        dt = time_device(
            lambda b: scores_v2_device(tables, v2tab, b), variants
        )
        from quaff_tpu.envelope import pack_strips

        wp = sum(s.band_width for s in pack_strips(env_r))
        print(
            f"[rows={max_rows}] {dt*1e3:.2f} ms, "
            f"{env_r.num_cells * bs / dt / 1e9:.2f} Gcells/s "
            f"(W_packed={wp})",
            flush=True,
        )


if __name__ == "__main__":
    main()
