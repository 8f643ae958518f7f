"""Benchmark: banded Viterbi DP throughput on the c8f30 align config.

Measures steady-state in-envelope DP cells/s of the production fill path
(Pallas v2 row kernel, float32: device-side integer key prep + in-kernel
emission lookup + VMEM-resident banded fill) on whatever accelerator JAX
exposes, using
the reference's integration-test workload: the 6,604-base nanopore read
c8f30 aligned against itself with k-mer seeding (k=6, threshold 14,
band 64 — the reference's default align banding, diagenv.h:12-18).

Prints ONE JSON line.  vs_baseline is computed against the MEASURED
throughput of the reference binary's banded Viterbi fill
(qmodel.cpp:1512-1560) on this host — 1.6e7 cells/s single-threaded,
re-measurable with tools/oracle/build_ref.sh + measure_baseline.py (see
BASELINE.md "Measured baseline").  The line also carries the driver's
other two metrics in "extra": end-to-end align reads/s on the c8f30
config (prep + fill + winner traceback + output) and warm EM-iteration
wall-clock, each with its own vs_ref multiplier.
"""

import json
import os
import pathlib
import time

import numpy as np

# tools/oracle/measure_baseline.py on this host (BASELINE.md, round 3)
REF_MEASURED = {
    "fill_cells_per_sec": 1.6e7,
    "c8f30_align_wall_s": 0.099,  # -> 10.1 reads/s end-to-end
    "em_iter_wall_s": 0.45,
    # 8-read all-vs-all overlap (28 unordered pairs, rc included):
    # best-of-5 whole-process wall 2.145 s -> 13.05 pairs/s
    "overlap_pairs_per_sec": 13.05,
    # 16-read point (120 pairs): best-of-3 wall 8.555 s; pairs/s is
    # N-independent for the single-threaded reference
    "overlap16_pairs_per_sec": 14.03,
}
REFERENCE_CELLS_PER_SEC = REF_MEASURED["fill_cells_per_sec"]


def _ref_same_session(ov_reads_by_n):
    """Re-time the reference binary inside THIS bench session.

    Host conditions (CPU steal, thermal state) move whole-session
    timings by +-40% (BASELINE.md "Round-4 measurement caveats"), so
    dividing today's repo wall by a round-2/3 reference constant is a
    cross-session artifact.  This re-runs the oracle binary on the
    exact same workloads, same host, same minutes, and returns measured
    walls; bench reports vs_ref_same_session_* from these alongside the
    stale-constant ratios.  Protocol = tools/oracle/measure_baseline.py
    (best-of-N wall; CPU steal only ever ADDS time).

    ov_reads_by_n: {n: [FastSeq]} — the identical read sets the repo
    overlap pass timed, written to FASTQ for the oracle.

    Returns None (and bench omits the same-session family) if the
    oracle binary is absent and cannot be built in 300 s.
    """
    import subprocess
    import tempfile

    repo = pathlib.Path(__file__).parent
    quaff = pathlib.Path("/tmp/quaffref/quaff")
    if not quaff.exists():
        try:
            subprocess.run(
                ["bash", str(repo / "tools" / "oracle" / "build_ref.sh")],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=300, check=True,
            )
        except Exception:
            return None
    if not quaff.exists():
        return None

    c8f30 = str(repo / "tests" / "data" / "c8f30.fastq.gz")
    scratch = tempfile.mkdtemp(prefix="quaffref-bench-")

    def best(cmd, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            subprocess.run(
                cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                cwd=scratch,
            )
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_align = best([str(quaff), "align", c8f30, c8f30, "-kmatchn", "14",
                    "-fwdstrand", "-nothreshold"], n=7)
    tr1 = best([str(quaff), "train", c8f30, c8f30, "-kmatchn", "14",
                "-fwdstrand", "-force", "-maxiter", "1"], n=3)
    tr3 = best([str(quaff), "train", c8f30, c8f30, "-kmatchn", "14",
                "-fwdstrand", "-force", "-maxiter", "3"], n=3)
    out = {
        "c8f30_align_wall_s": round(t_align, 4),
        "em_iter_wall_s": round((tr3 - tr1) / 2, 4),
    }
    for n, reads in sorted(ov_reads_by_n.items()):
        p = pathlib.Path(scratch) / f"ov{n}.fastq"
        with open(p, "w") as fh:
            for r in reads:
                r.write_fastq(fh)
        # the single-threaded reference is N-independent in pairs/s
        # (measured 13-14 at N=8 and N=16, BASELINE.md), so cap the
        # repeat count as N grows to bound bench wall
        t = best([str(quaff), "overlap", str(p), "-kmatchn", "14",
                  "-nothreshold"], n=3 if n <= 8 else 2)
        out[f"overlap{n}_wall_s"] = round(t, 4)
        out[f"overlap{n}_pairs_per_sec"] = round(n * (n - 1) // 2 / t, 3)
    return out


def main():
    from quaff_tpu.cli import _accelerator_alive

    if not _accelerator_alive(default_timeout=150.0):
        # fall back to the portable XLA engine on the host CPU so the
        # bench still emits its JSON line (marked via the unit string)
        import jax

        jax.config.update("jax_platforms", "cpu")
        return _main_cpu_fallback()
    try:
        return _main_accelerator()
    except Exception as e:  # emit a result even if the device path dies
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(
            f"bench: accelerator path failed ({type(e).__name__}); "
            "falling back to the host CPU measurement",
            file=sys.stderr,
        )
        return _main_cpu_fallback()


def _first_result_metrics():
    """One-shot time-to-first-result through the production pipelines,
    measured BEFORE this process touches the accelerator: the
    small-workload native gates (QUAFF_NATIVE_SMALL_CELLS) answer these
    host-side without even initialising the backend — the reference's
    only usage model is the one-shot binary (t/quaff.cpp:104-326,
    0.099 s measured), and the process's first device dispatch costs
    seconds on the axon tunnel.  MUST run before any jax backend
    init / kernel dispatch in this process (the gates key off
    KERNEL_WARM and skip themselves once a kernel has run)."""
    import io

    from quaff_tpu.aligner import DPConfig, QuaffAligner
    from quaff_tpu.formats.alignment import AlignmentPrinter
    from quaff_tpu.io.fastseq import add_revcomps, read_fast_seqs
    from quaff_tpu.model.params import QuaffNullParams, default_params
    from quaff_tpu.overlap import QuaffOverlapAligner

    data = pathlib.Path(__file__).parent / "tests" / "data"
    ref = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    ref.qual = ""
    read = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    params = default_params()
    printer = AlignmentPrinter()
    printer.log_odds_threshold = float("-inf")
    config = DPConfig(kmer_threshold=14, threads=4)
    null = QuaffNullParams.fit([read])
    t0 = time.perf_counter()
    aligner = QuaffAligner(params, null, config)
    out = io.StringIO()
    aligner.align_all(out, [ref], [read], printer)
    dt_align = time.perf_counter() - t0
    assert "Score" in out.getvalue()

    ov_reads = _overlap_reads(8, 0)
    ov_null = QuaffNullParams.fit(ov_reads)
    t0 = time.perf_counter()
    ov = QuaffOverlapAligner(params, ov_null, config)
    out = io.StringIO()
    ov.align_all(out, add_revcomps(ov_reads), 8, printer)
    dt_ov = time.perf_counter() - t0
    metrics = {
        "align_first_result_seconds": round(dt_align, 3),
        "overlap_first_result_seconds": round(dt_ov, 3),
    }

    # one-shot count (one read/ref pair): the trainer's small-workload
    # gate routes this through the f64 CPU-device engine (local
    # persistent-cache compiles) instead of the counts kernel's
    # 10-130 s per-process axon recompile
    try:
        from quaff_tpu.trainer import QuaffCounter

        counter = QuaffCounter(params, null, config, True)
        t0 = time.perf_counter()
        counts, ll, _ = counter.get_counts([ref], [read], [[0]])
        metrics["count_first_result_seconds"] = round(
            time.perf_counter() - t0, 3
        )
    except Exception:
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)

    # server-mode floor: a LONG-LIVED warm server answering a one-read
    # align request over the reference's framed loopback protocol —
    # the documented amortisation for one-shot walls.  Runs while this
    # process's kernels are still cold, so requests ride the native
    # small-workload path (no device, no compile risk inside bench).
    try:
        import json as _json
        import socket as _socket
        import threading as _threading

        from quaff_tpu.server import QuaffServer, RemoteWorker

        s = _socket.socket()
        s.bind(("", 0))
        port = s.getsockname()[1]
        s.close()
        server = QuaffServer(
            "align", config, [ref], [read], 1,
            printer=printer, params=params, null_model=null,
        )
        th = _threading.Thread(
            target=server.serve, args=(port, 1),
            kwargs={"ready_out": io.StringIO()},  # keep bench stdout clean
            daemon=True,
        )
        th.start()
        for _ in range(100):
            try:
                _socket.create_connection(
                    ("localhost", port), timeout=0.2
                ).close()
                break
            except OSError:
                time.sleep(0.05)
        worker = RemoteWorker("localhost", port)
        payload = _json.dumps({"yName": read.name})
        r1 = worker.request(payload)  # first request (warm caches)
        assert "Score" in r1
        t0 = time.perf_counter()
        worker.request(payload)
        metrics["server_mode_align_request_seconds"] = round(
            time.perf_counter() - t0, 4
        )
        worker.quit()
        th.join(timeout=5)
    except Exception:
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
    return metrics


def _main_accelerator():
    import jax
    import jax.numpy as jnp

    # one-shot TTFR first: these must precede the process's first
    # backend init / kernel dispatch (see _first_result_metrics)
    first_result = None
    try:
        first_result = _first_result_metrics()
    except Exception:
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)

    from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables
    from quaff_tpu.dp.pallas_v2 import V2Tables, scores_v2_device
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.envelope import make_envelope
    from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
    from quaff_tpu.model.params import default_params

    data = pathlib.Path(__file__).parent / "tests" / "data"
    y = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    x = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    x.qual = ""

    params = default_params()
    tables = ScoreTables.from_params(params)
    env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=14, cell_size=24)

    batch_size = int(os.environ.get("QUAFF_BENCH_BATCH", "2048"))
    # production align layout: lane-packed strips (this workload's 415-wide
    # 3-cluster bounding band packs into ~206 member lanes -> W=256)
    batch = PairBatch.build_packed([(x, y, env)] * batch_size, tables)
    tdev = device_tables(tables)
    bdev = device_batch(batch)

    cells_per_pair = env.num_cells

    v2tab = V2Tables(tables)

    # distinct inputs per iteration: the attached-device runtime caches
    # identical executions, which would make repeat timings meaningless
    n_iters = int(os.environ.get("QUAFF_BENCH_ITERS", "5"))
    n_warm = int(os.environ.get("QUAFF_BENCH_WARMUP", "2"))
    variants = []
    for i in range(n_warm + n_iters):
        b = dict(bdev)
        b["y_qual"] = bdev["y_qual"].at[:, i].set((bdev["y_qual"][:, i] + 1) % 40)
        variants.append(b)
    import jax as _jax

    _jax.block_until_ready([b["y_qual"] for b in variants])

    from quaff_tpu.dp.pallas_v2 import batch_max_prop

    mp = batch_max_prop(batch)

    def run(b):
        return scores_v2_device(tables, v2tab, b, max_prop=mp)

    # warmup/compile; np.asarray forces a device->host fetch, which is the
    # only reliable completion fence on tunnelled-device runtimes (their
    # block_until_ready can resolve before execution finishes).  The warm
    # pass uses its own distinct variants so the runtime's execution cache
    # cannot serve the timed pass.
    np.asarray(run(bdev))
    for i in range(n_warm):
        np.asarray(run(variants[i]))

    # per-iteration timing; the median filters transient tunnel/device
    # contention (e.g. a cold runtime right after another process)
    times = []
    for i in range(n_warm, n_warm + n_iters):
        t0 = time.perf_counter()
        np.asarray(run(variants[i]))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    total_cells = cells_per_pair * batch_size
    cells_per_sec = total_cells / dt

    result = {
        "metric": "banded_viterbi_cells_per_sec",
        "value": round(cells_per_sec, 1),
        "unit": "DP cells/s (in-envelope, c8f30 align config, f32)",
        "vs_baseline": round(cells_per_sec / REFERENCE_CELLS_PER_SEC, 3),
    }
    if os.environ.get("QUAFF_BENCH_FILL_ONLY"):
        print(json.dumps(result))
        return
    try:
        result["extra"] = _end_to_end_metrics()
    except Exception:
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
    if first_result:
        result.setdefault("extra", {}).update(first_result)
    print(json.dumps(result))


def _perturbed_reads(data, n, salt):
    """n distinct copies of c8f30 (quality strings perturbed per copy and
    per salt): the attached-device runtime caches identical executions,
    so every timed pass must see fresh bytes.  The gz is parsed ONCE
    and copied (re-parsing per read cost minutes at n=4096+)."""
    import copy

    from quaff_tpu.io.fastseq import read_fast_seqs

    base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    reads = []
    for i in range(n):
        r = copy.copy(base)
        r.__dict__.pop("_null_ll_cache", None)
        r.name = f"c8f30_{i}"
        j = (salt * n + i) % len(r.qual)
        q = 33 + (ord(r.qual[j]) - 33 + 1 + salt) % 40
        r.qual = r.qual[:j] + chr(q) + r.qual[j + 1 :]
        reads.append(r)
    return reads


def _overlap_reads(n, salt=0):
    """All-vs-all overlap workload: n substrings of c8f30 (1/3 to 1/2
    length, 5% substitutions).  MUST stay in sync with
    tools/oracle/measure_baseline.py::overlap_reads so vs_ref_overlap
    compares identical inputs; salt > 0 perturbs one quality char per
    read (the attached-device runtime caches identical executions)."""
    from quaff_tpu.io.fastseq import FastSeq, read_fast_seqs

    data = pathlib.Path(__file__).parent / "tests" / "data"
    base = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    rng = np.random.default_rng(0)
    L = len(base.seq)
    reads = []
    for i in range(n):
        s0 = int(rng.integers(0, L // 2))
        ln = int(rng.integers(L // 3, L // 2))
        seq = list(base.seq[s0 : s0 + ln])
        qual = list(base.qual[s0 : s0 + ln])
        for _ in range(int(len(seq) * 0.05)):
            p = int(rng.integers(0, len(seq)))
            seq[p] = "acgt"[int(rng.integers(0, 4))]
        if salt:
            j = (salt * n + i) % len(qual)
            qual[j] = chr(33 + (ord(qual[j]) - 33 + salt) % 40)
        reads.append(
            FastSeq(name=f"r{i}", seq="".join(seq), qual="".join(qual))
        )
    return reads


def _end_to_end_metrics(n_reads: int = 128, n_ov: int = 8):
    """The driver's other metrics (BASELINE.json): end-to-end align
    reads/s on the c8f30 config (envelope prep + batched fill + winner
    traceback + Stockholm output) and one warm EM iteration's wall
    (E-step counts + M-step refit), both at n_reads=128 — the scale the
    round-3 verdict set for these metrics — and all-vs-all overlap
    pairs/s at n_ov=8 (the workload measure_baseline.py times on the
    reference binary), measured through the production pipelines."""
    import io

    from quaff_tpu.aligner import DPConfig, QuaffAligner
    from quaff_tpu.formats.alignment import AlignmentPrinter
    from quaff_tpu.io.fastseq import read_fast_seqs
    from quaff_tpu.model.params import QuaffNullParams, default_params
    from quaff_tpu.trainer import QuaffCounter

    data = pathlib.Path(__file__).parent / "tests" / "data"
    ref = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    ref.qual = ""
    refs = [ref]
    params = default_params()
    # threads=4: the host side of the pipeline (winner f64 fills,
    # tracebacks, envelope prep) uses the host's cores, exactly as the
    # reference's own -threads scheduler would; vs_ref multipliers are
    # against the reference's single-core measurement (BASELINE.md)
    config = DPConfig(kmer_threshold=14, threads=4)
    printer = AlignmentPrinter()
    printer.log_odds_threshold = float("-inf")

    reads0 = _perturbed_reads(data, n_reads, 0)
    null = QuaffNullParams.fit(reads0)
    aligner = QuaffAligner(params, null, config)
    # warm/compile pass: its wall is the time-to-first-result for align
    # in a fresh process with a warm persistent compile cache (the axon
    # remote compiler still recompiles kernels server-side per process,
    # so this carries that variance — same caveat as EM's first iter)
    t0 = time.perf_counter()
    aligner.align_all(io.StringIO(), refs, reads0, printer)  # warm/compile
    dt_align_first = time.perf_counter() - t0
    times = []
    for salt in (1, 2, 3):
        reads = _perturbed_reads(data, n_reads, salt)
        out = io.StringIO()
        t0 = time.perf_counter()
        aligner.align_all(out, refs, reads, printer)
        times.append(time.perf_counter() - t0)
        assert "Score" in out.getvalue()
    dt_align = float(np.median(times))
    reads_per_sec = n_reads / dt_align

    # one EM iteration, warm: E-step expected counts + M-step refit.
    # The warm-up call's wall is reported as em_first_iter_seconds —
    # time-to-first-result in a fresh process with a warm persistent
    # compile cache (the axon remote compiler still recompiles Pallas
    # kernels server-side on first execution, so this number carries
    # that variance; see CLAUDE.md).
    order = [list(range(len(refs))) for _ in reads0]
    counter = QuaffCounter(params, null, config, True)
    t0 = time.perf_counter()
    counts, loglike, order = counter.get_counts(refs, reads0, order)  # warm
    dt_em_first = time.perf_counter() - t0
    times = []
    qp = params
    for salt in (4, 5, 6):
        reads = _perturbed_reads(data, n_reads, salt)
        counter = QuaffCounter(qp, null, config, True)
        t0 = time.perf_counter()
        counts, loglike, order2 = counter.get_counts(
            refs, reads, [list(range(len(refs))) for _ in reads]
        )
        from quaff_tpu.model.params import QuaffParamCounts

        cwp = QuaffParamCounts.zero(qp.match_kmer_len, qp.indel_kmer_len)
        cwp.add_weighted(counts, 1.0)
        qp2 = cwp.fit()
        times.append(time.perf_counter() - t0)
        qp = qp2  # next E-step sees fresh params, like a real EM loop
    dt_em = float(np.median(times))

    # all-vs-all overlap: n_reads c8f30 substrings = n*(n-1)/2 unordered
    # pairs (rc included), same workload measure_baseline.py times on
    # the reference binary
    from quaff_tpu.io.fastseq import add_revcomps
    from quaff_tpu.overlap import QuaffOverlapAligner

    def time_overlap(n):
        times = []
        for salt in (0, 7, 8):  # salt 0 doubles as the warm/compile pass
            ov_reads = _overlap_reads(n, salt)
            ov_null = QuaffNullParams.fit(ov_reads)
            ov = QuaffOverlapAligner(params, ov_null, config)
            seqs = add_revcomps(ov_reads)
            out = io.StringIO()
            t0 = time.perf_counter()
            ov.align_all(out, seqs, n, printer)
            times.append(time.perf_counter() - t0)
        # (warm median, cold first-call wall)
        return float(np.median(times[1:])), times[0]

    ov_pairs = n_ov * (n_ov - 1) // 2
    ov_warm, dt_ov_first = time_overlap(n_ov)
    ov_pps = ov_pairs / ov_warm
    # 16-read point: the production-representative all-vs-all scale —
    # the batched device scorer amortises its dispatch latency while the
    # single-threaded reference stays at ~14 pairs/s at any N
    ov16_pps = 120 / time_overlap(16)[0]
    # 64-read point (2016 unordered pairs): the large-N regime where
    # batching is this framework's reason to exist — kernel dispatch,
    # table upload, and compile shapes amortise over 16.8x more pairs
    ov64_pps = 2016 / time_overlap(64)[0]

    extra = {
        "align_reads_per_sec": round(reads_per_sec, 2),
        "vs_ref_align": round(
            reads_per_sec * REF_MEASURED["c8f30_align_wall_s"], 2
        ),
        "em_iter_seconds": round(dt_em, 4),
        # the reference's 0.45 s/iter is for ONE read-pair; ours covers
        # n_reads pairs per iteration, so normalise per read
        "vs_ref_em_iter": round(
            REF_MEASURED["em_iter_wall_s"] * n_reads / dt_em, 2
        ),
        "em_reads": n_reads,
        "em_first_iter_seconds": round(dt_em_first, 2),
        "align_first_call_seconds": round(dt_align_first, 2),
        "overlap_first_call_seconds": round(dt_ov_first, 2),
        "overlap_pairs_per_sec": round(ov_pps, 3),
        "overlap_pairs": ov_pairs,
        "overlap_pairs_per_sec_16": round(ov16_pps, 3),
        "overlap_pairs_per_sec_64": round(ov64_pps, 3),
        "ref_measured": REF_MEASURED,
    }
    if REF_MEASURED.get("overlap_pairs_per_sec"):
        extra["vs_ref_overlap"] = round(
            ov_pps / REF_MEASURED["overlap_pairs_per_sec"], 2
        )
    if REF_MEASURED.get("overlap16_pairs_per_sec"):
        extra["vs_ref_overlap_16"] = round(
            ov16_pps / REF_MEASURED["overlap16_pairs_per_sec"], 2
        )

    # ---- same-session reference family (the HEADLINE ratios) ----
    # Everything above divides by round-2/3 constants; host conditions
    # swing +-40% between sessions, so those are floor-quality evidence.
    # Re-time the oracle binary now, same host, same minutes, identical
    # workloads, and report vs_ref_same_session_* as the robust family.
    try:
        ref_now = _ref_same_session({
            n_ov: _overlap_reads(n_ov, 0), 16: _overlap_reads(16, 0),
        })
    except Exception:
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        ref_now = None
    if ref_now is not None:
        extra["ref_same_session"] = ref_now
        extra["vs_ref_same_session_align"] = round(
            reads_per_sec * ref_now["c8f30_align_wall_s"], 2
        )
        extra["vs_ref_same_session_em_iter"] = round(
            ref_now["em_iter_wall_s"] * n_reads / dt_em, 2
        )
        extra["vs_ref_same_session_overlap"] = round(
            ov_pps / ref_now[f"overlap{n_ov}_pairs_per_sec"], 2
        )
        ref16 = ref_now["overlap16_pairs_per_sec"]
        extra["vs_ref_same_session_overlap_16"] = round(ov16_pps / ref16, 2)
        # the reference's pairs/s is N-independent (single-threaded
        # scheduler, measured equal at N=8/16); its same-session 16-read
        # rate is the denominator at 64 (a 2x2016/14 s oracle run would
        # double bench wall for the same number)
        extra["vs_ref_same_session_overlap_64"] = round(ov64_pps / ref16, 2)
    return extra


def _main_cpu_fallback():
    """Accelerator unreachable: measure the host-CPU production fill.

    Uses the native C++ banded Viterbi (one fill per core via the thread
    pool — the path CPU deployments actually run) when built, else the
    XLA engine.  Keeps the same workload and JSON shape; the unit string
    records that this is the no-accelerator fallback so the number is
    not mistaken for a TPU result.
    """
    import jax
    import jax.numpy as jnp

    from quaff_tpu import native
    from quaff_tpu.dp.engine import (
        PairBatch,
        device_batch,
        device_tables,
        dp_fill,
    )
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.envelope import make_envelope
    from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
    from quaff_tpu.model.params import default_params

    data = pathlib.Path(__file__).parent / "tests" / "data"
    y = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    x = read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]
    x.qual = ""

    params = default_params()
    tables = ScoreTables.from_params(params)
    env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=14, cell_size=24)
    batch_size = int(os.environ.get("QUAFF_BENCH_BATCH", "8"))
    batch = PairBatch.build([(x, y, env)] * batch_size, tables)

    native.get_lib(auto_build=True)
    if native.available():
        def run():
            return native.align_score_native(batch, tables, mode="viterbi")
    else:
        tdev = device_tables(tables)
        bdev = device_batch(batch)

        def run():
            return jax.block_until_ready(
                dp_fill(
                    tdev, bdev, mode="viterbi", local=True,
                    return_matrices=False, dtype=jnp.float32,
                )["score"]
            )

    run()  # compile / warm
    n_iters = int(os.environ.get("QUAFF_BENCH_ITERS", "3"))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    cells_per_sec = env.num_cells * batch_size / dt
    print(
        json.dumps(
            {
                "metric": "banded_viterbi_cells_per_sec",
                "value": round(cells_per_sec, 1),
                "unit": (
                    "DP cells/s (in-envelope, c8f30 align config; "
                    "CPU FALLBACK - accelerator unreachable)"
                ),
                "vs_baseline": round(
                    cells_per_sec / REFERENCE_CELLS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
