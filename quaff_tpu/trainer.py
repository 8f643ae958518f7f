"""Baum-Welch EM training and E-step counting.

Replaces the reference's QuaffTrainer / QuaffCountingScheduler / counting
tasks (src/qmodel.cpp:1909-2478): the per-(read, ref) Forward-Backward
fills run as batched device computations (dp_forward_backward); the
reference's per-read bookkeeping — null-model baseline, running
log-likelihood, the Δ=20 backward-pass skip, posterior count weighting,
and best-first ref ordering with pruning (qmodel.cpp:2238-2271) — is kept
exactly so EM trajectories match.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from .aligner import DPConfig, FWDBACK_CELL_SIZE
from .dp.counts import dp_forward_backward
from .dp.engine import PairBatch, device_batch, device_tables, pow2ceil
from .dp.scores import ScoreTables
from .io.fastseq import FastSeq, KmerIndex
from .model.params import QuaffCounts, QuaffNullParams, QuaffParamCounts, QuaffParams

# EM convergence parameters (reference qmodel.h:19-20)
MAX_EM_ITERATIONS = 100
MIN_EM_LOGLIKE_INC = 0.01

# E-step kernel batch ceiling and scoped-VMEM cell budget (B_pad * W).
# The fused fwd_store/bwd_counts pair keeps more [B, W] f32 buffers
# resident than the score kernels, so its budget is tuned separately
# (tools/prof/vmem_tune.py, v5e with the raised Mosaic VMEM ceiling):
# B=1024 W=128 rows=3072 runs at 1.68 Gcells/s vs 0.92 at B=256, and
# 256k cells compile cleanly; B=2048 at full rows exhausts HBM (the
# 3 forward row streams are 12*B*W*rows bytes — the _ESTEP_HBM_BYTES
# term).  QUAFF_ESTEP_VMEM_CELLS overrides the VMEM cell budget.
_ESTEP_MAX_BATCH = 1024
_ESTEP_HBM_BYTES = 6.0e9


def _estep_vmem_cells() -> int:
    import os

    return int(os.environ.get("QUAFF_ESTEP_VMEM_CELLS", str(256 * 1024)))

# drop refs whose log-likelihood trails the total by more than this
# (MAX_TRAINING_LOG_DELTA, qmodel.cpp:23)
MAX_TRAINING_LOG_DELTA = 20.0


def _log_sum_exp(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(-abs(a - b)))


def _extract_pair_counts(res: dict, b: int, mk: int, ik: int) -> QuaffCounts:
    return QuaffCounts(
        match_kmer_len=mk,
        indel_kmer_len=ik,
        insert=np.asarray(res["insert_counts"][b], dtype=np.float64),
        match=np.asarray(res["match_counts"][b], dtype=np.float64),
        m2m=np.asarray(res["m2m"][b], dtype=np.float64),
        m2i=np.asarray(res["m2i"][b], dtype=np.float64),
        m2d=np.asarray(res["m2d"][b], dtype=np.float64),
        m2e=np.asarray(res["m2e"][b], dtype=np.float64),
        i2i=float(res["i2i"][b]),
        i2m=float(res["i2m"][b]),
        d2d=float(res["d2d"][b]),
        d2m=float(res["d2m"][b]),
    )


class QuaffCounter:
    """E-step count computation for reads against references."""

    def __init__(
        self,
        params: QuaffParams,
        null_model: QuaffNullParams,
        config: DPConfig,
        use_null_model: bool = True,
        prefer_kernel: bool = True,
    ):
        self.params = params
        self.null_model = null_model
        self.config = config
        self.use_null_model = use_null_model
        self.prefer_kernel = prefer_kernel
        self.tables = ScoreTables.from_params(params)
        self._tdev_cache = None
        self._tdev_cpu64 = None

    @property
    def _tdev(self):
        """Engine device tables, built on first use (an eager build at
        construction initialised the backend + uploaded tables the
        small-workload CPU route never touches)."""
        if self._tdev_cache is None:
            self._tdev_cache = device_tables(self.tables)
        return self._tdev_cache

    def _use_kernel(self, y: FastSeq) -> bool:
        import jax

        return (
            self.prefer_kernel
            and jax.default_backend() == "tpu"
            and y.has_qual()
        )

    def _count_read_kernel(
        self, refs, y, sort_order, y_null_ll
    ) -> Tuple[QuaffParamCounts, float, List[int]]:
        """TPU fast path: fused Pallas forward+backward E-step.  Counts are
        mathematically the reference's posterior-weighted totals; the Δ=20
        backward-skip becomes an exact (negligible-weight) contribution."""
        from .dp.pallas_counts import estep_fused
        from .dp.pallas_v2 import V2Tables

        mk, ik = self.params.match_kmer_len, self.params.indel_kmer_len
        if not hasattr(self, "_v2tab"):
            self._v2tab = V2Tables(self.tables)
        y_index = KmerIndex(y, self.config.kmer_len)
        envs = {
            nx: self.config.make_envelope(refs[nx], y_index, FWDBACK_CELL_SIZE)
            for nx in sort_order
        }
        pairs = [(refs[nx], y, envs[nx]) for nx in sort_order]
        # lane-packed strips: multi-cluster envelopes cost their member
        # lanes (and their stored forward rows shrink to match)
        batch = PairBatch.build_packed(pairs, self.tables)
        bdev = device_batch(batch)
        # single fused dispatch: forward fill -> device-side posterior
        # weights -> weighted backward counts (no standalone forward pass)
        fwd_dev, _, totals = estep_fused(
            self.tables, self._v2tab, bdev, y_null_ll,
            local=self.config.local,
        )
        fwd = np.asarray(fwd_dev, dtype=np.float64)
        # convergence/pruning statistics stay in host f64 (the kernel's
        # device y_ll is f32 and only shapes the count weights)
        y_loglike = y_null_ll
        for f in fwd:
            y_loglike = _log_sum_exp(y_loglike, float(f))
        qc = QuaffCounts(
            match_kmer_len=mk,
            indel_kmer_len=ik,
            insert=np.asarray(totals["insert_counts"], dtype=np.float64),
            match=np.asarray(totals["match_counts"], dtype=np.float64),
            m2m=np.asarray(totals["m2m"], dtype=np.float64),
            m2i=np.asarray(totals["m2i"], dtype=np.float64),
            m2d=np.asarray(totals["m2d"], dtype=np.float64),
            m2e=np.asarray(totals["m2e"], dtype=np.float64),
            i2i=float(np.sum(np.asarray(totals["i2i"]))),
            i2m=float(np.sum(np.asarray(totals["i2m"]))),
            d2d=float(np.sum(np.asarray(totals["d2d"]))),
            d2m=float(np.sum(np.asarray(totals["d2m"]))),
        )
        y_counts = QuaffParamCounts.from_counts(qc)
        xy_loglike = np.full(len(refs), -math.inf)
        for pos, nx in enumerate(sort_order):
            xy_loglike[nx] = fwd[pos]
        new_order = sorted(range(len(refs)), key=lambda nx: -xy_loglike[nx])
        new_order = [
            nx for nx in new_order
            if xy_loglike[nx] >= y_loglike - MAX_TRAINING_LOG_DELTA
        ]
        return y_counts, y_loglike, new_order

    def _small_cpu_estep_gate(self, refs, reads, sort_order) -> bool:
        """Time-to-first-result: run a small E-step on the CPU-device
        f64 engine (the parity path — compiles locally in seconds and
        caches persistently) instead of paying this process's first
        counts-kernel dispatch (axon server-side recompile, 10-130 s)
        plus the backend init.  Active only while the counts kernel is
        cold and the estimated workload is under the shared
        QUAFF_NATIVE_SMALL_CELLS budget; warm processes and production
        batches keep the fused TPU kernel."""
        import os

        import jax

        from .dp import pallas_counts

        budget = int(os.environ.get("QUAFF_NATIVE_SMALL_CELLS", "40000000"))
        if (
            not budget
            or not self.prefer_kernel
            or pallas_counts.KERNEL_WARM
            or (jax.config.jax_platforms or "").split(",")[0] == "cpu"
        ):
            return False
        # rough fwd+bwd cell estimate: default-band width x read length
        # per candidate pair, x3 for the two passes + count reduction
        est = sum(
            3 * 420 * len(reads[ny].seq) * max(len(sort_order[ny]), 1)
            for ny in range(len(reads))
        )
        return est <= budget

    def count_read(
        self, refs: List[FastSeq], y: FastSeq, sort_order: List[int],
        force_engine: bool = False, cpu_engine: bool = False,
    ) -> Tuple[QuaffParamCounts, float, List[int]]:
        """One read's posterior-weighted counts against all refs
        (QuaffCountingTask::run, qmodel.cpp:2238-2271).

        Returns (counts, log-likelihood, updated ref sort order).
        force_engine routes around the kernel fast path (used for reads
        whose band exceeds the kernel budgets even after the memory-
        fitted refit — the engine is exact on any width).
        """
        mk, ik = self.params.match_kmer_len, self.params.indel_kmer_len
        y_counts = QuaffParamCounts.zero(mk, ik)
        y_null_ll = (
            self.null_model.log_likelihood(y) if self.use_null_model else -math.inf
        )
        if not sort_order:
            return y_counts, y_null_ll, sort_order

        from .logger import logger

        if (
            not cpu_engine  # first: _use_kernel would init the backend
            and not force_engine
            and self._use_kernel(y)
            and not logger.logging_tag("postmatrix")
        ):
            # the fused kernel never materialises posterior matrices; the
            # postmatrix dump forces the exact engine path
            return self._count_read_kernel(refs, y, sort_order, y_null_ll)

        y_index = KmerIndex(y, self.config.kmer_len)
        envs = {
            nx: self.config.make_envelope(refs[nx], y_index, FWDBACK_CELL_SIZE)
            for nx in sort_order
        }
        pairs = [(refs[nx], y, envs[nx]) for nx in sort_order]
        batch = PairBatch.build(pairs, self.tables)
        from .logger import logger

        want_post = logger.logging_tag("postmatrix")
        if cpu_engine:
            # small-workload TTFR route (_small_cpu_estep_gate): the f64
            # parity engine pinned to the host CPU device — compiles
            # locally (persistent cache), never touches the accelerator
            import jax
            import jax.numpy as jnp

            from .precision import x64_scope

            cpu = jax.devices("cpu")[0]
            with x64_scope(), jax.default_device(cpu):
                if self._tdev_cpu64 is None:
                    self._tdev_cpu64 = device_tables(self.tables)
                bdev = {
                    k: jax.device_put(v, cpu)
                    for k, v in device_batch(batch).items()
                }
                res = dp_forward_backward(
                    self._tdev_cpu64,
                    bdev,
                    local=self.config.local,
                    dtype=jnp.float64,
                    num_match_kmers=self.params.num_match_kmers,
                    num_indel_kmers=self.params.num_indel_kmers,
                    return_post=want_post,
                )
                res = {k: np.asarray(v) for k, v in res.items()}
        else:
            res = dp_forward_backward(
                self._tdev,
                device_batch(batch),
                local=self.config.local,
                dtype=self.config.resolve_dtype(),
                num_match_kmers=self.params.num_match_kmers,
                num_indel_kmers=self.params.num_indel_kmers,
                return_post=want_post,
            )
        fwd = np.asarray(res["fwd_score"], dtype=np.float64)
        back = np.asarray(res["back_score"], dtype=np.float64)
        # fwd/back self-check (MAX_FRACTIONAL_FWDBACK_ERROR,
        # qmodel.cpp:20,1496-1497: warn when |fwd-back| exceeds 1e-4
        # of min(|fwd|,|back|))
        for pos in range(len(sort_order)):
            f, bk = fwd[pos], back[pos]
            if (
                math.isfinite(f)
                and math.isfinite(bk)
                and abs(f - bk) > 1e-4 * min(abs(f), abs(bk))
            ):
                logger.log(
                    0,
                    f"\n\nWarning: forward score ({f:g}) does not match "
                    f"backward score ({bk:g})\n\n\n",
                )

        # replicate the reference's running-loglike backward-skip logic
        xy_loglike = np.full(len(refs), -math.inf)
        took_backward = np.zeros(len(refs), dtype=bool)
        y_loglike = y_null_ll
        for pos, nx in enumerate(sort_order):
            xy_loglike[nx] = fwd[pos]
            if xy_loglike[nx] >= y_loglike - MAX_TRAINING_LOG_DELTA:
                took_backward[nx] = True
            y_loglike = _log_sum_exp(y_loglike, xy_loglike[nx])

        for pos, nx in enumerate(sort_order):
            if not took_backward[nx] or not math.isfinite(xy_loglike[nx]):
                continue
            if want_post:
                from .dp.debug import write_post_matrix

                write_post_matrix(
                    refs[nx], y, envs[nx],
                    np.asarray(res["post_mat"][pos]),
                    np.asarray(res["post_ins"][pos]),
                    np.asarray(res["post_del"][pos]),
                )
            post = math.exp(xy_loglike[nx] - y_loglike)
            qc = _extract_pair_counts(res, pos, mk, ik)
            y_counts.add_weighted(QuaffParamCounts.from_counts(qc), post)

        # best-first resort, pruning unproductive refs (qmodel.cpp:2264-2270)
        new_order = sorted(range(len(refs)), key=lambda nx: -xy_loglike[nx])
        new_order = [
            nx
            for nx in new_order
            if xy_loglike[nx] >= y_loglike - MAX_TRAINING_LOG_DELTA
        ]
        return y_counts, y_loglike, new_order

    def get_counts(
        self,
        refs: List[FastSeq],
        reads: List[FastSeq],
        sort_order: Optional[List[List[int]]] = None,
    ) -> Tuple[QuaffParamCounts, float, List[List[int]]]:
        """Counts summed over all reads (QuaffTrainer::getCounts).

        On TPU backends with quality reads, pairs from MANY reads are
        batched into single fused E-step dispatches (the TPU analogue of
        the reference's read-level thread pool, qmodel.cpp:2005-2031) —
        one kernel launch per shape bucket instead of one per read."""
        mk, ik = self.params.match_kmer_len, self.params.indel_kmer_len
        if sort_order is None:
            sort_order = [list(range(len(refs))) for _ in reads]
        from .logger import ProgressLogger, logger

        plog = ProgressLogger(level=2)
        plog.init_progress("Expected counts (E-step)")
        if (
            not logger.logging_tag("postmatrix")
            and self._small_cpu_estep_gate(refs, reads, sort_order)
        ):
            # TTFR small route: f64 CPU-device engine, per read
            total = QuaffParamCounts.zero(mk, ik)
            loglike = 0.0
            new_orders = []
            for ny, y in enumerate(reads):
                y_counts, y_ll, order = self.count_read(
                    refs, y, sort_order[ny], cpu_engine=True
                )
                total.add_weighted(y_counts, 1.0)
                loglike += y_ll
                new_orders.append(order)
            plog.done()
            return total, loglike, new_orders
        if (
            len(reads) > 1
            and all(self._use_kernel(y) for y in reads)
            and not logger.logging_tag("postmatrix")
        ):
            out = self._get_counts_kernel_batched(refs, reads, sort_order, plog)
            plog.done()
            return out
        total = QuaffParamCounts.zero(mk, ik)
        loglike = 0.0
        new_orders: List[List[int]] = []
        for ny, y in enumerate(reads):
            plog.log_progress(ny / max(len(reads), 1), f"read {ny + 1}/{len(reads)}")
            y_counts, y_ll, order = self.count_read(refs, y, sort_order[ny])
            total.add_weighted(y_counts, 1.0)
            loglike += y_ll
            new_orders.append(order)
        plog.done()
        return total, loglike, new_orders

    def _get_counts_kernel_batched(self, refs, reads, sort_order, plog):
        """Cross-read fused E-step: all (read, ref) pairs bucketed by
        (packed width, read-length pad) and dispatched in large batches;
        per-read posterior weights are computed on device via read-group
        ids.  Count totals accumulate across the whole epoch; per-read
        log-likelihoods and ref orderings are reconstructed host-side in
        f64 exactly as the per-read path does."""
        from .dp.pallas_counts import estep_fused_multi
        from .dp.pallas_v2 import V2Tables
        from .envelope import pack_strips

        mk, ik = self.params.match_kmer_len, self.params.indel_kmer_len
        if not hasattr(self, "_v2tab"):
            self._v2tab = V2Tables(self.tables)
        null_lls = [
            self.null_model.log_likelihood(y) if self.use_null_model else -math.inf
            for y in reads
        ]

        def round_up(v, m):
            return ((v + m - 1) // m) * m

        jobs = []  # (ny, nx, env)
        oversize = []  # reads the kernel cannot take even after refit
        for ny, y in enumerate(reads):
            if not sort_order[ny]:
                continue
            y_index = KmerIndex(y, self.config.kmer_len)
            # long-band guard: the fused kernel streams 3 forward row
            # planes of [lp, B>=8, wp] f32 through HBM; a pair whose
            # packed width exceeds the per-pair budget re-banded with the
            # memory-fitted walk (envelope.fit_envelope_lanes — the
            # reference's diagenv.cpp:60-106 with the device cost model)
            lp = round_up(max(len(y.seq), 1), 512)
            lane_cap = min(
                int(_ESTEP_HBM_BYTES // (12 * lp * 8)),
                _estep_vmem_cells() // 8,
                int(os.environ.get("QUAFF_ESTEP_LANE_CAP", "4096")),
            )
            read_jobs = []
            for nx in sort_order[ny]:
                env = self.config.make_envelope(
                    refs[nx], y_index, FWDBACK_CELL_SIZE
                )
                if self.config.sparse:
                    wp = sum(s.band_width for s in pack_strips(env))
                    if wp > lane_cap:
                        from .envelope import fit_envelope_lanes

                        env = fit_envelope_lanes(
                            refs[nx], y_index, lane_cap,
                            band_size=self.config.band_size,
                            kmer_threshold=max(self.config.kmer_threshold, 0),
                        )
                        wp = sum(s.band_width for s in pack_strips(env))
                    if wp > lane_cap:
                        # even the top seed level exceeds the budget (the
                        # true cluster itself is wider than the device
                        # can stream): this read takes the per-read
                        # engine path below — correct on any width
                        read_jobs = None
                        break
                read_jobs.append((ny, nx, env))
            if read_jobs is None:
                oversize.append(ny)
            else:
                jobs.extend(read_jobs)
        # Chunking strategy.  The kernel's cost is dominated by grid rows
        # (one step per read row), so two dispatches at 2048 and 2560
        # rows cost ~4600 row-steps where one merged 2560-row dispatch
        # costs 2560: mixed read lengths are CHUNKED greedily (longest
        # first) rather than bucketed per padded length, with NO padding
        # cap — within a width group the rows are shared, so a shorter
        # read's padding rows are already being scanned and its marginal
        # cost is one more lane (~0.2 ms over a 3072-row dispatch,
        # measured) vs 35-90 ms for its own dispatch.  Only the batch
        # ceiling and the HBM row-stream budget bound a chunk.  A read's
        # pairs all go in ONE chunk — the in-kernel posterior weights
        # normalise over the read's refs present in the batch, so
        # splitting a read across dispatches would mis-weight its counts.
        per_read: dict = {}
        for job in jobs:
            ny, nx, env = job
            wp = round_up(
                max(sum(s.band_width for s in pack_strips(env)), 128), 128
            )
            ent = per_read.setdefault(ny, [0, []])
            ent[0] = max(ent[0], wp)
            ent[1].append(job)
        groups: dict = {}
        for ny, (wp, js) in per_read.items():
            groups.setdefault(wp, []).append((ny, js))

        total = QuaffParamCounts.zero(mk, ik)
        xy_ll = {}
        n_done = 0
        for wp, rj in sorted(groups.items()):
            rj.sort(key=lambda e: -len(reads[e[0]].seq))
            i = 0
            while i < len(rj):
                lp = round_up(len(reads[rj[i][0]].seq), 512)
                # bound the forward row streams (3 x [Ly, B, W] f32 in
                # HBM) AND the kernels' scoped VMEM (B_pad * W beyond
                # ~100k cells overflows the 16 MB limit), rounded DOWN
                # to a power of two so the padded batch honours both
                max_b = min(
                    _ESTEP_MAX_BATCH,
                    int(_ESTEP_HBM_BYTES // (12 * wp * lp)),
                    _estep_vmem_cells() // wp,
                )
                b_cap = 8
                while b_cap * 2 <= max_b:
                    b_cap *= 2
                max_b = b_cap
                chunk = list(rj[i][1])
                i += 1
                while i < len(rj):
                    ny_j, js_j = rj[i]
                    if len(chunk) + len(js_j) > max_b:
                        break
                    chunk.extend(js_j)
                    i += 1
                group_of, gid, null_g = {}, [], []
                for ny, nx, env in chunk:
                    if ny not in group_of:
                        group_of[ny] = len(null_g)
                        null_g.append(null_lls[ny])
                    gid.append(group_of[ny])
                # pad B to a power-of-two quantum so recompiles are
                # bounded: pad pairs repeat the last entry but map to a
                # sentinel read group whose huge "null" drives their
                # posterior weight to exp(fwd - 1e30) = 0, so they add
                # nothing to the count totals
                B = len(chunk)
                bq = pow2ceil(B)
                pairs = [
                    (refs[nx], reads[ny], env) for ny, nx, env in chunk
                ]
                if bq > B:
                    pairs.extend([pairs[-1]] * (bq - B))
                    gid.extend([len(null_g)] * (bq - B))
                    null_g.append(1e30)
                batch = PairBatch.build_packed(
                    pairs,
                    self.tables,
                    width=wp,
                    max_y_len=lp,
                )
                fwd_dev, _, totals = estep_fused_multi(
                    self.tables, self._v2tab, device_batch(batch),
                    np.asarray(gid, np.int32), np.asarray(null_g),
                    local=self.config.local,
                )
                fwd = np.asarray(fwd_dev, dtype=np.float64)[:B]
                qc = QuaffCounts(
                    match_kmer_len=mk,
                    indel_kmer_len=ik,
                    insert=np.asarray(totals["insert_counts"], dtype=np.float64),
                    match=np.asarray(totals["match_counts"], dtype=np.float64),
                    m2m=np.asarray(totals["m2m"], dtype=np.float64),
                    m2i=np.asarray(totals["m2i"], dtype=np.float64),
                    m2d=np.asarray(totals["m2d"], dtype=np.float64),
                    m2e=np.asarray(totals["m2e"], dtype=np.float64),
                    i2i=float(np.sum(np.asarray(totals["i2i"]))),
                    i2m=float(np.sum(np.asarray(totals["i2m"]))),
                    d2d=float(np.sum(np.asarray(totals["d2d"]))),
                    d2m=float(np.sum(np.asarray(totals["d2m"]))),
                )
                total.add_weighted(QuaffParamCounts.from_counts(qc), 1.0)
                for (ny, nx, env), f in zip(chunk, fwd):
                    xy_ll[(ny, nx)] = float(f)
                n_done += len(chunk)
                plog.log_progress(
                    n_done / max(len(jobs), 1),
                    f"{n_done}/{len(jobs)} pair fills",
                )

        # oversize reads (band too wide even for the fitted envelope):
        # per-read engine path, exact on any width
        oversize_results = {}
        for ny in oversize:
            oversize_results[ny] = self.count_read(
                refs, reads[ny], sort_order[ny], force_engine=True
            )

        # per-read statistics in host f64 (mirrors _count_read_kernel)
        loglike = 0.0
        new_orders: List[List[int]] = []
        for ny in range(len(reads)):
            if ny in oversize_results:
                y_counts, y_ll, order = oversize_results[ny]
                total.add_weighted(y_counts, 1.0)
                loglike += y_ll
                new_orders.append(order)
                continue
            y_loglike = null_lls[ny]
            xy = np.full(len(refs), -math.inf)
            for nx in sort_order[ny]:
                xy[nx] = xy_ll.get((ny, nx), -math.inf)
                y_loglike = _log_sum_exp(y_loglike, xy[nx])
            order = sorted(range(len(refs)), key=lambda nx: -xy[nx])
            order = [
                nx for nx in order
                if xy[nx] >= y_loglike - MAX_TRAINING_LOG_DELTA
            ]
            loglike += y_loglike
            new_orders.append(order)
        return total, loglike, new_orders


@dataclass
class QuaffTrainer:
    """EM driver (QuaffTrainer::fit, qmodel.cpp:2169-2231)."""

    max_iterations: int = MAX_EM_ITERATIONS
    min_fractional_loglike_increment: float = MIN_EM_LOGLIKE_INC
    max_read_bases: int = 0
    allow_null_model: bool = True
    save_params_filename: str = ""
    raw_counts_filename: str = ""
    counts_with_prior_filename: str = ""
    checkpoint_dir: str = ""  # preemption-safe EM state checkpointing

    def effective_reads(self, reads: List[FastSeq]) -> List[FastSeq]:
        """-maxreadmb training-set truncation (qmodel.cpp:2169-2183);
        exposed so external counts providers see the same read list."""
        if self.max_read_bases <= 0:
            return reads
        limited = []
        bases = 0
        for y in reads:
            limited.append(y)
            bases += len(y.seq)
            if bases >= self.max_read_bases:
                break
        return limited

    def fit(
        self,
        refs: List[FastSeq],
        reads: List[FastSeq],
        seed: QuaffParams,
        null_model: QuaffNullParams,
        pseudocounts: QuaffParamCounts,
        config: DPConfig,
        log=lambda *a: None,
        counts_provider=None,
    ) -> QuaffParams:
        """EM fit.  counts_provider, when given, replaces the local
        E-step: a callable (params, sort_order) -> (counts, loglike,
        sort_order) — used to farm counting to remote/qsub workers each
        iteration (QuaffTrainer::fit remote dispatch,
        qmodel.cpp:2050-2120)."""
        reads = self.effective_reads(reads)
        assert pseudocounts.match_kmer_len == seed.match_kmer_len
        assert pseudocounts.indel_kmer_len == seed.indel_kmer_len

        qp = seed
        prev_ll_with_prior = -math.inf
        sort_order = [list(range(len(refs))) for _ in reads]
        start_iter = 0
        if self.checkpoint_dir:
            from .checkpoint import TrainState, load_checkpoint, save_checkpoint

            ckpt = load_checkpoint(self.checkpoint_dir)
            if ckpt is not None and len(ckpt.sort_order) == len(reads):
                qp = ckpt.params
                prev_ll_with_prior = ckpt.prev_loglike_with_prior
                sort_order = ckpt.sort_order
                start_iter = ckpt.iteration
                log(f"Resuming from checkpoint at EM iteration {start_iter}")
            import jax

            if jax.process_count() > 1:
                # every host must resume the same EM state or the SPMD
                # mesh steps diverge silently: only host 0 writes the
                # checkpoint, so the dir must be on a shared filesystem
                import jax.numpy as jnp
                from jax.experimental import multihost_utils

                iters = multihost_utils.process_allgather(
                    jnp.asarray(start_iter, jnp.int32)
                )
                if int(iters.min()) != int(iters.max()):
                    raise RuntimeError(
                        "multi-host checkpoint resume desync: hosts see "
                        f"different EM iterations {sorted(set(int(i) for i in iters))} "
                        f"— -checkpoint dir '{self.checkpoint_dir}' must be "
                        "a shared filesystem visible to every host"
                    )
        for it in range(start_iter, self.max_iterations):
            if counts_provider is not None:
                counts, loglike, sort_order = counts_provider(qp, sort_order)
            else:
                counter = QuaffCounter(
                    qp, null_model, config, self.allow_null_model
                )
                counts, loglike, sort_order = counter.get_counts(
                    refs, reads, sort_order
                )
            from .parallel.distributed import is_primary

            primary = is_primary()  # only host 0 writes artifacts
            if self.raw_counts_filename and primary:
                with open(self.raw_counts_filename, "w") as f:
                    counts.write_json(f)
                    f.write("\n")
            log_prior = pseudocounts.log_prior(qp)
            ll_with_prior = loglike + log_prior
            log(
                f"EM iteration {it + 1}: log-likelihood ({loglike:g}) + "
                f"log-prior ({log_prior:g}) = {ll_with_prior:g}"
            )
            if it > 0 and ll_with_prior < prev_ll_with_prior + abs(
                prev_ll_with_prior
            ) * self.min_fractional_loglike_increment:
                break
            prev_ll_with_prior = ll_with_prior

            counts_with_prior = QuaffParamCounts.zero(
                qp.match_kmer_len, qp.indel_kmer_len
            )
            counts_with_prior.add_weighted(counts, 1.0)
            counts_with_prior.add_weighted(pseudocounts, 1.0)
            if self.counts_with_prior_filename and primary:
                with open(self.counts_with_prior_filename, "w") as f:
                    counts_with_prior.write_json(f)
                    f.write("\n")

            qp = counts_with_prior.fit()
            qp.fit_ref_seqs(refs)

            if self.save_params_filename and primary:
                with open(self.save_params_filename, "w") as f:
                    qp.write_json(f)
                    f.write("\n")
            if self.checkpoint_dir and primary:
                save_checkpoint(
                    self.checkpoint_dir,
                    TrainState(
                        params=qp,
                        iteration=it + 1,
                        prev_loglike_with_prior=prev_ll_with_prior,
                        sort_order=sort_order,
                    ),
                )
        return qp
