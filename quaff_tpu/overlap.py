"""Read-vs-read overlap detection pipeline.

Replaces the reference's QuaffOverlapAligner / QuaffOverlapTask /
QuaffOverlapScheduler (src/qoverlap.cpp:304-613): the pair-emission score
tables are built once per (params, strand) — fixing the reference's
per-task rebuild — pairs are enumerated in the reference's order
(ordered pairs over original reads vs everything later, including
reverse-complement copies), and each pair's banded Viterbi runs on device
with host traceback (including the adjacent-insert/delete squashing of
qoverlap.cpp:231-267).
"""

from __future__ import annotations

import math
import os
from typing import IO, List, Optional, Tuple

import numpy as np

from .aligner import DPConfig, VITERBI_CELL_SIZE
from .dp.engine import PairBatch, device_batch, pow2ceil
from .dp.overlap import OverlapScoreTables, overlap_device_tables, overlap_fill
from .dp.scores import ScoreTables
from .envelope import Envelope
from .formats.alignment import GAP_CHAR, Alignment, AlignmentPrinter
from .io.fastseq import FastSeq, KmerIndex, SeqIntervalCoords
from .model.params import QuaffNullParams, QuaffParams

NEG_INF = -math.inf


def _ov_interpret() -> bool:
    """QUAFF_OV_INTERPRET=1 runs the overlap kernel in Pallas interpret
    mode — lets the TPU fast path (and its pruning logic) run end-to-end
    on the CPU backend for integration tests.  Non-TPU backends always
    interpret (a -mesh run on the CPU backend reaches the kernel too)."""
    import os

    if os.environ.get("QUAFF_OV_INTERPRET") == "1":
        return True
    import jax

    return jax.default_backend() != "tpu"


def _ov_vmem_cells() -> int:
    """Scoped-VMEM batch budget for the overlap kernel (B_pad * W cells).

    The kernel keeps ~18 [B, W] f32 buffers resident plus double-buffered
    row streams; the default is measured on v5e with the raised Mosaic
    VMEM ceiling (dp/pallas_v2.VMEM_LIMIT_BYTES): a 512k budget runs the
    16-read all-vs-all sweep 3-6x faster than the old 16 MiB-bound 96k
    (fewer distinct batch shapes to compile AND better occupancy;
    tools/prof/vmem_tune.py overlap).  Override with
    QUAFF_OV_VMEM_CELLS."""
    import os

    return int(os.environ.get("QUAFF_OV_VMEM_CELLS", str(512 * 1024)))


def _pallas_overlap_warm() -> bool:
    """Has this process already paid the overlap kernel's first
    dispatch?  (See pallas_overlap.KERNEL_WARM / the small-workload
    time-to-first-result gate in align_all.)"""
    from .dp import pallas_overlap

    return pallas_overlap.KERNEL_WARM


MATCH, INSERT, DELETE, START = 0, 1, 2, 3


def _y_strand_arrays(y: FastSeq, tables: OverlapScoreTables):
    """Per-position token/k-mer arrays for the second read.

    For reverse-strand pairs the reference scores the stored revcomp copy
    with arrays from the double-revcomp (= original) sequence, reversed
    back into the stored copy's coordinates (qoverlap.cpp:91-103); the
    quality array stays in stored coordinates.
    """
    if tables.y_complemented:
        y2 = y.revcomp()
        y_tok = y2.tokens()[::-1].copy()
        y_mk = y2.kmers(tables.match_kmer_len)[::-1].copy()
        y_ik = y2.kmers(tables.indel_kmer_len)[::-1].copy()
    else:
        y_tok = y.tokens()
        y_mk = y.kmers(tables.match_kmer_len)
        y_ik = y.kmers(tables.indel_kmer_len)
    y_q = y.qual_scores() if y.has_qual() else None
    return y_tok, y_mk, y_ik, y_q


def _insert_score_sum(tables: OverlapScoreTables, tok, qual) -> float:
    if qual is not None and len(qual) == len(tok):
        return float(np.sum(tables.insert_score[tok, qual]))
    return float(np.sum(tables.insert_score_noq[tok]))


class OverlapBatch:
    """Extends PairBatch with the x-side context arrays the overlap model
    needs (both sequences carry k-mer contexts and quality scores)."""

    def __init__(self, pairs: List[Tuple[FastSeq, FastSeq, Envelope]],
                 tables: OverlapScoreTables,
                 width: Optional[int] = None,
                 max_y_len: Optional[int] = None,
                 max_x_len: Optional[int] = None,
                 row_off: Optional[List[int]] = None,
                 n_rows: Optional[int] = None):
        st = ScoreTables.__new__(ScoreTables)  # only kmer lens used by build
        st.match_kmer_len = tables.match_kmer_len
        st.indel_kmer_len = tables.indel_kmer_len
        self.base = PairBatch.build(
            pairs, st, width=width, max_y_len=max_y_len, max_x_len=max_x_len
        )
        B = len(pairs)
        Lx = self.base.x_tok.shape[1]
        self.x_match_kmer = np.zeros((B, Lx), dtype=np.int32)
        self.x_indel_kmer_pad = np.zeros((B, Lx + 1), dtype=np.int32)
        self.x_qual = np.zeros((B, Lx), dtype=np.int32)
        self.x_has_qual = np.zeros(B, dtype=bool)
        self.x_insert_score = np.zeros(B)
        self.y_insert_score = np.zeros(B)
        self.y_arrays = []
        for b, (x, y, env) in enumerate(pairs):
            lx = len(x.seq)
            x_tok = x.tokens()
            self.x_match_kmer[b, :lx] = x.kmers(tables.match_kmer_len)
            self.x_indel_kmer_pad[b, 1 : lx + 1] = x.kmers(tables.indel_kmer_len)
            xq = x.qual_scores() if x.has_qual() else None
            if xq is not None:
                self.x_qual[b, :lx] = xq
                self.x_has_qual[b] = True
            self.x_insert_score[b] = _insert_score_sum(tables, x_tok, xq)
            y_tok, y_mk, y_ik, y_q = _y_strand_arrays(y, tables)
            ly = len(y.seq)
            self.base.y_tok[b, :ly] = y_tok
            self.base.y_match_kmer[b, :ly] = y_mk
            self.base.y_indel_kmer_pad[b, 1 : ly + 1] = y_ik
            self.y_insert_score[b] = _insert_score_sum(tables, y_tok, y_q)
            self.y_arrays.append((y_tok, y_mk, y_ik, y_q))
        self.row_off = None
        if row_off is not None:
            # trim each pair's y-side arrays to its live row window
            # [row_off+1, row_off+n_rows] (overlap_fill "j_off"); kmer
            # contexts were computed on the full sequence, so slicing
            # keeps them exact
            R = n_rows
            base = self.base
            yt = np.zeros((B, R), base.y_tok.dtype)
            ym = np.zeros((B, R), base.y_match_kmer.dtype)
            yq_a = np.zeros((B, R), base.y_qual.dtype)
            yik = np.zeros((B, R + 1), base.y_indel_kmer_pad.dtype)
            for b in range(B):
                o = int(row_off[b])
                n = max(0, min(R, int(base.y_len[b]) - o))
                yt[b, :n] = base.y_tok[b, o : o + n]
                ym[b, :n] = base.y_match_kmer[b, o : o + n]
                yq_a[b, :n] = base.y_qual[b, o : o + n]
                yik[b, : n + 1] = base.y_indel_kmer_pad[b, o : o + n + 1]
            base.y_tok, base.y_match_kmer = yt, ym
            base.y_qual, base.y_indel_kmer_pad = yq_a, yik
            base.max_y_len = R
            self.row_off = np.asarray(row_off, np.int32)

    def device(self) -> dict:
        import jax.numpy as jnp

        from .dp.engine import _narrow_int

        d = device_batch(self.base)
        d.update(
            {
                # pure gather indices downstream: narrow transfer dtypes
                "x_match_kmer": _narrow_int(
                    self.x_match_kmer, self.base.match_kmer_bound
                ),
                "x_indel_kmer_pad": _narrow_int(
                    self.x_indel_kmer_pad, self.base.indel_kmer_bound
                ),
                "x_qual": _narrow_int(self.x_qual, 94),
                "x_has_qual": jnp.asarray(self.x_has_qual),
                "x_insert_score": jnp.asarray(self.x_insert_score),
                "y_insert_score": jnp.asarray(self.y_insert_score),
            }
        )
        if self.row_off is not None:
            d["j_off"] = jnp.asarray(self.row_off)
        return d


def overlap_traceback(
    x: FastSeq,
    y: FastSeq,
    env: Envelope,
    tables: OverlapScoreTables,
    mat: np.ndarray,
    ins: np.ndarray,
    dele: np.ndarray,
    result: float,
    row_off: int = 0,
) -> Alignment:
    """QuaffOverlapViterbiMatrix::alignment (qoverlap.cpp:162-290).

    row_off: matrices from a row-trimmed fill store true row j at array
    row j - row_off (rows outside the window are outside the envelope,
    hence -inf)."""
    x_len, y_len = len(x.seq), len(y.seq)
    x_tok = x.tokens()
    x_mk = x.kmers(tables.match_kmer_len)
    x_ik = np.concatenate([[0], x.kmers(tables.indel_kmer_len)])
    x_q = x.qual_scores() if x.has_qual() else None
    y_tok, y_mk, y_ik_raw, y_q = _y_strand_arrays(y, tables)
    y_ik = np.concatenate([[0], y_ik_raw])

    d_lo, W = env.band_lo, env.band_width

    from .native import overlap_traceback_cols

    cols = overlap_traceback_cols(
        x_mk, x_ik, x_q, x_len, x_q is not None,
        y_mk, y_ik, y_q, y_len, y_q is not None,
        tables, row_off, d_lo, mat, ins, dele,
    )
    if cols is not None:
        from .dp.traceback import _cols_to_str

        col_x, col_y, x_start, x_end, y_start, y_end = cols
        row_x = FastSeq(
            name="read_x", comment=f"substr({x.name},{x_start}..{x_end})"
        )
        row_y = FastSeq(
            name="read_y", comment=f"substr({y.name},{y_start}..{y_end})"
        )
        row_x.seq = _cols_to_str(col_x, x.seq, GAP_CHAR)
        row_y.seq = _cols_to_str(col_y, y.seq, GAP_CHAR)
        if x_q is not None:
            row_x.qual = _cols_to_str(col_x, x.qual, "~")
        if y_q is not None:
            row_y.qual = _cols_to_str(col_y, y.qual, "~")
        row_x.source = SeqIntervalCoords(
            x.name, x_start, x_end, False
        ).compose(x.source)
        row_y.source = SeqIntervalCoords(
            y.name, y_start, y_end, False
        ).compose(y.source)
        return Alignment(gapped_seq=[row_x, row_y], score=result)

    def cell(arr, i, j):
        if j < 0 or j > y_len or i < 0 or i > x_len:
            return NEG_INF
        w = i - j - d_lo
        if w < 0 or w >= W:
            return NEG_INF
        r = j - row_off
        if r < 0 or r >= arr.shape[0]:
            return NEG_INF
        return float(arr[r, w])

    def match_emit(i, j):
        xi, yj = x_mk[i - 1], y_mk[j - 1]
        if x_q is not None and y_q is not None:
            return float(tables.pair_qq[xi, yj, x_q[i - 1], y_q[j - 1]])
        if x_q is not None:
            return float(tables.pair_xq[xi, yj, x_q[i - 1]])
        if y_q is not None:
            return float(tables.pair_yq[xi, yj, y_q[j - 1]])
        return float(tables.pair_nn[xi, yj])

    def m2m(i, j):
        return float(tables.m2m[x_ik[i], y_ik[j]])

    def m2i(i, j):
        return float(tables.m2i[x_ik[i], y_ik[j]])

    def m2d(i, j):
        return float(tables.m2d[x_ik[i], y_ik[j]])

    # end cell: best over the last row and last column (qoverlap.cpp:164-182)
    x_end, y_end = x_len, y_len
    best = cell(mat, x_len, y_len)
    for i_end in range(x_len, 0, -1):
        sc = cell(mat, i_end, y_len)
        if sc > best:
            best, x_end, y_end = sc, i_end, y_len
    for j_end in range(y_len, 0, -1):
        sc = cell(mat, x_len, j_end)
        if sc > best:
            best, x_end, y_end = sc, x_len, j_end

    i, j = x_end, y_end
    x_row: List[str] = []
    y_row: List[str] = []
    xq_row: List[str] = []
    yq_row: List[str] = []
    x_del: List[str] = []
    xq_del: List[str] = []
    y_ins: List[str] = []
    yq_ins: List[str] = []
    state = MATCH

    def prepend(dst, items):
        dst[:0] = items

    while state != START:
        if state == MATCH:
            emit = match_emit(i, j)
            i -= 1
            j -= 1
            new_x, new_y = [x.seq[i]], [y.seq[j]]
            new_xq = [x.qual[i]] if x_q is not None else []
            new_yq = [y.qual[j]] if y_q is not None else []
            cands = [
                (cell(mat, i, j) + m2m(i, j) + emit, MATCH),
                (cell(ins, i, j) + tables.i2m_eff + emit, INSERT),
                (cell(dele, i, j) + tables.d2m_eff + emit, DELETE),
            ]
            if j == 0 or i == 0:
                cands.append((emit, START))
            prepend(x_row, new_x)
            prepend(y_row, new_y)
            prepend(xq_row, new_xq)
            prepend(yq_row, new_yq)
        elif state == INSERT:
            j -= 1
            prepend(y_ins, [y.seq[j]])
            if y_q is not None:
                prepend(yq_ins, [y.qual[j]])
            cands = [
                (cell(mat, i, j) + m2i(i, j), MATCH),
                (cell(ins, i, j) + tables.i2i_eff, INSERT),
                (cell(dele, i, j) + tables.d2i_eff, DELETE),
            ]
        else:  # DELETE
            i -= 1
            prepend(x_del, [x.seq[i]])
            if x_q is not None:
                prepend(xq_del, [x.qual[i]])
            cands = [
                (cell(mat, i, j) + m2d(i, j), MATCH),
                (cell(ins, i, j) + tables.i2d_eff, INSERT),
                (cell(dele, i, j) + tables.d2d_eff, DELETE),
            ]
        src, state = NEG_INF, None
        for sc, st in cands:
            if sc > src:
                src, state = sc, st
        if state is None:
            raise RuntimeError("Overlap traceback error: no finite source")

        if state == MATCH:
            # squash adjacent insertions & deletions (qoverlap.cpp:231-267)
            ins_len, del_len = len(y_ins), len(x_del)
            shared = min(ins_len, del_len)
            extra_ins, extra_del = ins_len - shared, del_len - shared
            # gap-over-y columns (the unshared tail of the insert run)
            prepend(x_row, [GAP_CHAR] * extra_ins)
            prepend(y_row, y_ins[shared:])
            if x_q is not None:
                prepend(xq_row, ["~"] * extra_ins)
            if y_q is not None:
                prepend(yq_row, yq_ins[shared:])
            # x-over-gap columns
            prepend(x_row, x_del[shared:])
            prepend(y_row, [GAP_CHAR] * extra_del)
            if x_q is not None:
                prepend(xq_row, xq_del[shared:])
            if y_q is not None:
                prepend(yq_row, ["~"] * extra_del)
            # shared columns become aligned pairs
            prepend(x_row, x_del[:shared])
            prepend(y_row, y_ins[:shared])
            if x_q is not None:
                prepend(xq_row, xq_del[:shared])
            if y_q is not None:
                prepend(yq_row, yq_ins[:shared])
            x_del, xq_del, y_ins, yq_ins = [], [], [], []

    x_start, y_start = i + 1, j + 1
    row_x = FastSeq(
        name="read_x", comment=f"substr({x.name},{x_start}..{x_end})"
    )
    row_y = FastSeq(
        name="read_y", comment=f"substr({y.name},{y_start}..{y_end})"
    )
    row_x.seq = "".join(x_row)
    row_y.seq = "".join(y_row)
    row_x.qual = "".join(xq_row)
    row_y.qual = "".join(yq_row)
    row_x.source = SeqIntervalCoords(x.name, x_start, x_end, False).compose(x.source)
    row_y.source = SeqIntervalCoords(y.name, y_start, y_end, False).compose(y.source)
    return Alignment(gapped_seq=[row_x, row_y], score=result)


class QuaffOverlapAligner:
    def __init__(
        self,
        params: QuaffParams,
        null_model: QuaffNullParams,
        config: DPConfig,
    ):
        self.params = params
        self.null_model = null_model
        self.config = config
        # Table build + device upload cached ON the params object: the
        # pair-emission tables are the overlap mode's dominant fixed cost
        # (16*16*94*94 lse host build + ~36 MB through the ~10 MB/s
        # device tunnel), and callers that construct a fresh aligner per
        # batch (with identical params) would pay them every time.  The
        # reference rebuilds them per TASK (qoverlap.cpp:77-79, a known
        # inefficiency SURVEY.md flags to hoist); we hoist per params.
        # Params objects are treated as immutable (the trainer's M-step
        # returns a new QuaffParams).
        cache = params.__dict__.get("_overlap_table_cache")
        if cache is None:
            base = ScoreTables.from_params(params)
            cache = params.__dict__["_overlap_table_cache"] = {
                "base": base,
                "fwd": OverlapScoreTables.from_params(params, False, base),
                "fwd_dev": None,
                "rev": None,
                "rev_dev": None,
                "cpu64": {},
            }
        self._tcache = cache
        self.tables_fwd = cache["fwd"]
        self.tables_rev: Optional[OverlapScoreTables] = cache["rev"]
        self._base = cache["base"]
        self._tdev_cpu64: dict = cache["cpu64"]
        # -mesh: device mesh for sharded pair scoring (set by the CLI;
        # the exact pass + traceback stay host-side either way)
        self.mesh = None

    def _tables(self, y_complemented: bool):
        """(host tables, engine device tables|None) for a strand.  The
        device tables build lazily via _tdev: only the XLA matrix
        fallback consumes them, and building them eagerly cost a ~36 MB
        tunnel upload (plus the whole backend init) at CONSTRUCTION —
        pure waste for the native small-workload path
        (time-to-first-result)."""
        if not y_complemented:
            return self.tables_fwd, self._tcache["fwd_dev"]
        if self.tables_rev is None:
            self.tables_rev = OverlapScoreTables.from_params(
                self.params, True, self._base
            )
            self._tcache["rev"] = self.tables_rev
        return self.tables_rev, self._tcache["rev_dev"]

    def _tdev(self, y_complemented: bool):
        """Engine device tables for a strand, built on first use."""
        key = "rev_dev" if y_complemented else "fwd_dev"
        if self._tcache[key] is None:
            self._tcache[key] = overlap_device_tables(
                self._tables(y_complemented)[0]
            )
        return self._tcache[key]

    def _null_ll(self, seq: FastSeq, comp: bool = False) -> float:
        """Null log-likelihood of a read (of its revcomp when comp),
        memoized on the FastSeq — in all-vs-all runs each read's value is
        needed once per pair it appears in (~N times), and the revcomp
        rebuild + token scan dominate the finish phase otherwise."""
        key = (id(self.null_model), comp)
        cache = seq.__dict__.setdefault("_null_ll_cache", {})
        if key not in cache:
            s = seq.revcomp() if comp else seq
            cache[key] = self.null_model.log_likelihood(s)
        return cache[key]

    def enumerate_pairs(self, seqs: List[FastSeq], n_originals: int):
        """The reference scheduler's pair order (qoverlap.cpp:475-547):
        (nx, ny) ascending with nx < ny, stopping once nx+1 >= nOriginals;
        ny >= nOriginals means the second read is a revcomp copy."""
        for nx in range(len(seqs)):
            if nx + 1 >= n_originals:
                break
            for ny in range(nx + 1, len(seqs)):
                yield nx, ny, ny >= n_originals

    def _exact_fill(self, batch: "OverlapBatch", tables, tdev) -> dict:
        """Run the exact banded fill for a (possibly padded) overlap batch
        and return host numpy arrays: score [B] and mat/ins/del
        [B, Ly, W].  The native C++ engine (native/overlapdp.cpp) is used
        when built — one threaded f64 fill per pair, no XLA dispatch; on
        accelerator backends the XLA fallback runs the f64 parity fill on
        the host CPU device (matrices never cross the device link)."""
        import jax

        from .native import overlap_fill_native

        res = overlap_fill_native(batch, tables)
        if res is not None:
            return res

        bdev = batch.device()
        if jax.default_backend() != "cpu":
            from .precision import x64_scope

            cpu = jax.devices("cpu")[0]
            with x64_scope(), jax.default_device(cpu):
                bdev = {k: jax.device_put(v, cpu) for k, v in bdev.items()}
                key = tables.y_complemented
                if key not in self._tdev_cpu64:
                    # f64 tables built inside the x64 scope, reused per strand
                    self._tdev_cpu64[key] = overlap_device_tables(tables)
                res = overlap_fill(
                    self._tdev_cpu64[key], bdev, return_matrices=True,
                    dtype=self.config.resolve_dtype(),
                )
                return {k: np.asarray(v) for k, v in res.items()}
        if tdev is None:  # lazily-built engine device tables (_tdev)
            tdev = self._tdev(tables.y_complemented)
        res = overlap_fill(
            tdev, bdev, return_matrices=True, dtype=self.config.resolve_dtype()
        )
        return {k: np.asarray(v) for k, v in res.items()}

    def _finish_pair(
        self,
        x: FastSeq,
        y: FastSeq,
        y_complemented: bool,
        env: Envelope,
        tables: OverlapScoreTables,
        res: dict,
        b: int,
        row_off: int = 0,
    ) -> Optional[Alignment]:
        score = float(res["score"][b])
        if not math.isfinite(score):
            return None
        from .logger import logger

        if logger.logging_tag("dpmatrix") and row_off == 0:
            from .dp.debug import write_dp_matrix

            write_dp_matrix(
                x, y, env, res["mat"][b], res["ins"][b], res["del"][b], score
            )
        a = overlap_traceback(
            x, y, env, tables, res["mat"][b], res["ins"][b], res["del"][b],
            score, row_off=row_off,
        )
        a.score -= self._null_ll(x) + self._null_ll(y, y_complemented)
        return a

    def overlap_pair(
        self, x: FastSeq, y: FastSeq, y_complemented: bool
    ) -> Optional[Alignment]:
        tables, tdev = self._tables(y_complemented)
        y_index = KmerIndex(y, self.config.kmer_len)
        env = self.config.make_envelope(x, y_index, VITERBI_CELL_SIZE)
        batch = OverlapBatch([(x, y, env)], tables)
        res = self._exact_fill(batch, tables, tdev)
        return self._finish_pair(x, y, y_complemented, env, tables, res, 0)

    def _use_fast_scores(self) -> bool:
        import jax

        return jax.default_backend() == "tpu"

    def align_all(
        self,
        out: IO[str],
        seqs: List[FastSeq],
        n_originals: int,
        printer: AlignmentPrinter,
    ) -> None:
        printer.write_header(out, seqs, group_by_query=False)
        from .logger import logger

        pair_list = list(self.enumerate_pairs(seqs, n_originals))
        if (
            (self._use_fast_scores() or self.mesh is not None)
            and len(pair_list) > 1
            # full-envelope dpmatrix dumps need the sequential fills
            and not logger.logging_tag("dpmatrix")
        ):
            self._align_all_batched(out, seqs, pair_list, printer)
            return
        skip = None
        if (
            len(pair_list) > 1
            and printer.log_odds_threshold > NEG_INF
            and not logger.logging_tag("dpmatrix")
        ):
            skip = self._cpu_score_prepass(seqs, pair_list, printer)
        for k, (nx, ny, y_comp) in enumerate(pair_list):
            if skip is not None and skip[k]:
                continue
            a = self.overlap_pair(seqs[nx], seqs[ny], y_comp)
            if a is not None:
                printer.write_alignment(out, a)

    def _cpu_score_prepass(
        self, seqs, pair_list, printer, chunk_size: int = 32
    ) -> Optional[List[bool]]:
        """Score-only native prepass for the sequential (CPU) all-vs-all
        path: compute every pair's null-adjusted score with the
        matrix-free exact fill (bitwise equal to the full fill's score,
        thread-pooled) and mark pairs the printer would drop below its
        log-odds threshold — their full fill + traceback is skipped.
        Output is byte-identical to filling every pair (the reference
        also fills everything and thresholds at print time,
        qmodel.cpp:2570-2572; this just avoids the doomed matrices).
        Returns None when the native library is missing."""
        from .native import overlap_score_native

        def null_ll(i, comp=False):
            return self._null_ll(seqs[i], comp)

        y_indexes: dict = {}
        skip = [False] * len(pair_list)
        for y_comp in (False, True):
            idxs = [
                k for k, (_, _, yc) in enumerate(pair_list) if yc == y_comp
            ]
            if not idxs:
                continue
            tables, _ = self._tables(y_comp)
            for c0 in range(0, len(idxs), chunk_size):
                sub = idxs[c0 : c0 + chunk_size]
                pairs = []
                for k in sub:
                    nx, ny, _ = pair_list[k]
                    if ny not in y_indexes:
                        y_indexes[ny] = KmerIndex(
                            seqs[ny], self.config.kmer_len
                        )
                    env = self.config.make_envelope(
                        seqs[nx], y_indexes[ny], VITERBI_CELL_SIZE
                    )
                    pairs.append((seqs[nx], seqs[ny], env))
                batch = OverlapBatch(pairs, tables)
                sc = overlap_score_native(batch, tables)
                if sc is None:
                    return None
                for k, s in zip(sub, sc):
                    nx, ny, _ = pair_list[k]
                    adj = s - null_ll(nx) - null_ll(ny, y_comp)
                    skip[k] = adj < printer.log_odds_threshold
        return skip

    def _align_all_batched(self, out, seqs, pair_list, printer,
                           max_batch: int = 2048) -> None:
        """TPU fast path for all-vs-all overlap: batch-score every pair
        with the Pallas kernel, then run the exact fill + traceback only
        for pairs whose (null-adjusted) score can clear the report
        threshold."""
        from .dp.pallas_overlap import overlap_scores_kernel

        # QUAFF_OV_TIMELINE=1: stderr phase stamps (prep / bank / submit /
        # fetch / exact / write) for critical-path profiling — cProfile
        # distorts the async dispatch pipeline, wall stamps don't
        import sys as _sys
        import time as _time

        _tl = os.environ.get("QUAFF_OV_TIMELINE") == "1"
        _t0 = _time.perf_counter()

        def _stamp(tag):
            if _tl:
                print(
                    f"[ovtl] {_time.perf_counter() - _t0:7.3f} {tag}",
                    file=_sys.stderr, flush=True,
                )

        def round_up(v, m):
            return ((v + m - 1) // m) * m

        def null_ll(i, comp=False):
            return self._null_ll(seqs[i], comp)

        # build envelopes + bucket by strand and padded shape; each read's
        # k-mer index is shared across all pairs it appears in
        index_cache: dict = {}

        def y_index(ny):
            if ny not in index_cache:
                index_cache[ny] = KmerIndex(seqs[ny], self.config.kmer_len)
            return index_cache[ny]

        from .dp.pallas_overlap import packed_overlap_descriptors

        # -threads N parallelises envelope building + strip packing across
        # pairs (all-vs-all prep is quadratic in reads and was ~1 s of the
        # N=32 wall single-threaded); KmerIndex builds are serialised
        # up-front so the cache is safe to read concurrently
        for ny in {ny for _, ny, _ in pair_list}:
            y_index(ny)

        # long-band guard: packed widths beyond the lane cap re-band with
        # the memory-fitted walk (envelope.fit_envelope_lanes) — same
        # policy as align/E-step (spurious seed clusters on long reads)
        lane_cap = min(
            _ov_vmem_cells() // 8,
            int(os.environ.get("QUAFF_OVERLAP_LANE_CAP", "4096")),
        )

        def _pair_job(p):
            nx, ny, y_comp = p
            env = self.config.make_envelope(
                seqs[nx], y_index(ny), VITERBI_CELL_SIZE
            )
            wide = False
            if self.config.sparse:
                from .envelope import fit_envelope_lanes, pack_strips

                if sum(s.band_width for s in pack_strips(env)) > lane_cap:
                    env = fit_envelope_lanes(
                        seqs[nx], y_index(ny), lane_cap,
                        band_size=self.config.band_size,
                        kmer_threshold=max(self.config.kmer_threshold, 0),
                    )
                    # still too wide (the top seed cluster itself exceeds
                    # the budget): skip kernel scoring; the pair goes
                    # straight to the host exact pass, which handles any
                    # width
                    wide = sum(
                        s.band_width for s in pack_strips(env)
                    ) > lane_cap
            # lane-packed strips + live-row window: the kernel pays member
            # lanes and live rows only, not the bounding band / full read
            desc = packed_overlap_descriptors(
                [env], [len(seqs[nx].seq)], [len(seqs[ny].seq)]
            )
            return (nx, ny, y_comp, env), desc, wide

        packed: dict = {}
        wide_pairs = set()
        single_set: set = set()
        # thread the prep only when per-pair work is substantial (long
        # reads): the envelope build is mostly GIL-bound Python around
        # the native k-mer join, so pooling it is SLOWER at all-vs-all
        # sizes — measured 0.086 s serial vs 0.137 s pooled at 360
        # pairs, and 1.27 s serial vs 3.67 s pooled at 6048 pairs
        # (round 5; don't retry the pair-count gate)
        total_bases = sum(len(s.seq) for s in seqs)
        threaded_prep = (
            self.config.threads > 1
            and len(pair_list) > 1
            and total_bases / max(len(seqs), 1) > 16384
        )

        from concurrent.futures import ThreadPoolExecutor

        from .native import overlap_path_available

        slack = 1.0
        exact_futs = []
        exact_ex = None
        use_shared_pool = overlap_path_available()
        shared_xc: dict = {}
        shared_yc: dict = {}

        def _exact_timed(tag, *a, **kw):
            _stamp(f"exact_start {tag}")
            r = self._exact_pass(*a, **kw)
            _stamp(f"exact_end {tag}")
            return r

        def _submit_path_jobs(tag, cands_, seg_scores=None, chunk=None):
            if chunk is None:
                # slice size: small enough for incremental flushing /
                # load balance, large enough to amortise the batched
                # FFI call (QUAFF_OV_EXACT_CHUNK to experiment)
                chunk = int(os.environ.get("QUAFF_OV_EXACT_CHUNK", "12"))
            jobs_ = self._strip_jobs(seqs, cands_, seg_scores=seg_scores)
            # heaviest first: the pool drains FIFO, so an expensive pair
            # queued last becomes the wall-clock pole of the whole pass
            jobs_.sort(
                key=lambda it: -sum(r * s.band_width for s, _, r in it[1])
            )
            # render=False: workers return raw traceback payloads and the
            # incremental writer below renders them on the main thread —
            # keeping the workers' duty cycle almost purely native
            # (GIL-free) so 4 fills genuinely run on 4 cores
            w = self._path_worker(
                seqs, shared_xc, shared_yc, jobs_, render=False
            )

            def run(slice_):
                _stamp(f"exact_start {tag}+{len(slice_)}")
                r = w.slice(slice_)
                _stamp(f"exact_end {tag}+{len(slice_)}")
                return r

            for i in range(0, len(jobs_), chunk):
                exact_futs.append(exact_ex.submit(run, jobs_[i : i + chunk]))

        # Streaming early-exact (QUAFF_OV_STREAM_PREP=1, default OFF):
        # classify each pair AS PREP BUILDS IT and submit single-strip /
        # wide fills immediately, hoping to overlap the ~1.2 s GIL-bound
        # serial envelope loop with the pool's GIL-free fills.  Measured
        # a WASH at N=64 (interleaved A/B: 236 vs 247 pairs/s medians,
        # within host noise) — the prep loop holds the GIL continuously,
        # so worker pick/emit glue starves and slices launch late.
        # Kept as an experiment knob; don't flip the default without an
        # interleaved same-session A/B.
        streamed = (
            self.mesh is None
            and use_shared_pool
            and not threaded_prep
            and printer.log_odds_threshold == NEG_INF
            and os.environ.get("QUAFF_OV_EARLY_EXACT", "1") != "0"
            and os.environ.get("QUAFF_OV_STREAM_PREP", "0") == "1"
            and len(pair_list) > 1
        )
        stream_buf: list = []

        def _stream_flush(final=False):
            # ~2-slice batches; hold a remainder so slices stay full
            # (the batched native call amortises per-slice overhead)
            while stream_buf and (final or len(stream_buf) >= 24):
                take = stream_buf[:24]
                del stream_buf[:24]
                _submit_path_jobs("stream", take)

        if streamed:
            # prebuild every strand's tables BEFORE the pool exists: the
            # lazy rev-strand build is not thread-safe (a racing reader
            # can observe tables_rev set while _tdev_rev is still None)
            for yc in {False} | {p[2] for p in pair_list}:
                self._tables(yc)
            exact_ex = ThreadPoolExecutor(os.cpu_count() or 1)

        if threaded_prep:
            with ThreadPoolExecutor(self.config.threads) as ex:
                built = list(ex.map(_pair_job, pair_list))
        else:
            built = []
            for p in pair_list:
                r = _pair_job(p)
                built.append(r)
                if streamed:
                    job, desc, wide = r
                    nxny = (job[0], job[1])
                    if wide:
                        wide_pairs.add(nxny)
                        stream_buf.append(job)
                    elif int(np.count_nonzero(desc[3][0])) <= 1:
                        single_set.add(nxny)
                        stream_buf.append(job)
                    _stream_flush()
        if streamed:
            _stream_flush(final=True)
        _stamp(f"prep done ({len(built)} pairs)")
        jobs = []
        for job, desc, wide in built:
            jobs.append(job)
            packed[(job[0], job[1])] = desc
            if wide:
                wide_pairs.add((job[0], job[1]))
        buckets: dict = {}
        # Greedy chunking per strand, longest live-row window first.  The
        # measured kernel cost is lp * (a + b*Bp): a fixed per-row-step
        # term worth ~100 batch lanes plus a per-lane term (B=128 -> 63 ms
        # vs B=1024 -> 320 ms at lp=3584, tools/prof notes) — and each
        # extra dispatch also pays its submit RTT and a cold server-side
        # recompile.  Padding rows are therefore ~1000x cheaper than
        # extra dispatches: merge aggressively, capping only the
        # per-pair blowup (a pair may at most double its own rows) so a
        # pathological long pair cannot drag a fleet of short ones.
        # Chunks never mix lane tiers: widening a chunk multiplies every
        # member's cost, so each (strand, padded width) tier chunks
        # independently.
        OV_VMEM_CELLS = _ov_vmem_cells()

        # -nothreshold early-exact split (round 4): with the report
        # threshold at -inf the kernel's score FILTER is dead — its only
        # remaining value is the per-strip maxima that winnow the exact
        # pass's strip-picking fills.  A single-strip pair needs no
        # winnowing, so at -inf it skips kernel scoring entirely and its
        # f64 fill+traceback starts IMMEDIATELY, running under the
        # kernel dispatch+fetch latency of the multi-strip minority
        # (226/360 pairs are single-strip on the bench workload; the
        # exact pass, not the device, is the measured critical path).
        if (
            not streamed
            and self.mesh is None
            and printer.log_odds_threshold == NEG_INF
            and os.environ.get("QUAFF_OV_EARLY_EXACT", "1") != "0"
        ):
            for job in jobs:
                nx, ny = job[0], job[1]
                if (nx, ny) in wide_pairs:
                    continue
                if int(np.count_nonzero(packed[(nx, ny)][3][0])) <= 1:
                    single_set.add((nx, ny))

        # Time-to-first-result small-workload gate: while this process
        # has not yet paid the overlap kernel's first dispatch (axon
        # recompiles Pallas kernels server-side per process — seconds,
        # vs ~0.3 s of native fills for an 8-read all-vs-all), an
        # under-budget workload skips kernel scoring entirely: every
        # pair goes to the exact pass, which scores strips natively
        # (f64) and the printer applies the report threshold to the
        # exact scores.  Output identical; a warm kernel disables the
        # gate so repeated batches keep the device path.
        # (backend probed via jax.config rather than
        # jax.default_backend(): the latter initialises the backend — an
        # ~8 s axon tunnel handshake — which this gate exists to avoid;
        # explicitly CPU-pinned runs keep the parity kernel/engine path)
        import jax as _jax

        if (
            self.mesh is None
            and use_shared_pool
            and (_jax.config.jax_platforms or "") != "cpu"
            and not _pallas_overlap_warm()
        ):
            budget = int(
                os.environ.get("QUAFF_NATIVE_SMALL_CELLS", "40000000")
            )
            kernel_cells = 0
            for job in jobs:
                nx, ny = job[0], job[1]
                if (nx, ny) in wide_pairs or (nx, ny) in single_set:
                    continue
                member1, _, _, _, _, rows1 = packed[(nx, ny)]
                # multi-strip pairs pay strip-score fills + the path
                # fill: ~2x their member cells
                kernel_cells += 2 * int(np.count_nonzero(member1)) * rows1
            if budget and kernel_cells <= budget:
                for job in jobs:
                    nx, ny = job[0], job[1]
                    if (nx, ny) not in wide_pairs:
                        single_set.add((nx, ny))

        by_tier: dict = {}
        for job in jobs:
            nx, ny, y_comp, env = job
            if (nx, ny) in wide_pairs or (nx, ny) in single_set:
                continue  # no kernel scoring; exact pass handles it
            member1, _, _, _, _, rows1 = packed[(nx, ny)]
            wp1 = round_up(max(member1.shape[1], 128), 128)
            rp1 = round_up(max(rows1, 1), 512)
            by_tier.setdefault((y_comp, wp1), []).append((rp1, job))
        # Width-tier merging (round 4): a strict per-width tier gives a
        # pair with a unique 128-quantum width its own dispatch — the axis
        # the cost model above prices ~1000x a padded lane.  Merge each
        # strand's tiers ascending while a group's widest width stays
        # within 2x its narrowest member (same bounded-blowup rule as
        # rows), so near-uniform all-vs-all workloads collapse to ONE
        # width per strand and heterogeneous ones pay at most 2x lanes.
        by_group: dict = {}
        for strand in sorted({yc for yc, _ in by_tier}):
            widths = sorted(w for yc, w in by_tier if yc == strand)
            group_lo = None
            groups = []
            for w in widths:
                if group_lo is None or w > 2 * group_lo:
                    group_lo = w
                    groups.append([w])
                else:
                    groups[-1].append(w)
            for ws in groups:
                wp = ws[-1]
                ents = []
                for w in ws:
                    ents.extend(by_tier[(strand, w)])
                by_group[(strand, wp)] = ents
        for (y_comp, wp1), ents in by_group.items():
            # rows are sorted descending, and every chunk-boundary rule is
            # monotone in rp (rp < lp/2, batch cap, VMEM cap), so chunks
            # are CONTIGUOUS slices — one pass, no per-chunk rescans
            ents.sort(key=lambda e: -e[0])
            i = 0
            n = len(ents)
            while i < n:
                lp = ents[i][0]
                j = i + 1
                while (
                    j < n
                    and j - i < max_batch
                    and lp - ents[j][0] <= ents[j][0]
                    and pow2ceil(j - i + 1) * wp1 <= OV_VMEM_CELLS
                ):
                    j += 1
                buckets[(y_comp, wp1, lp)] = buckets.get(
                    (y_comp, wp1, lp), []
                ) + [e[1] for e in ents[i:j]]
                i = j

        # sequence bank: each distinct (sequence, strand) transferred ONCE;
        # chunks carry only row indices + envelope masks (all-vs-all would
        # otherwise re-ship every read per pair through the device link)
        import jax.numpy as jnp

        from .dp.engine import _narrow_int

        rows_keys = sorted(
            {(nx, False) for nx, _, _, _ in jobs}
            | {(ny, yc) for _, ny, yc, _ in jobs}
        )
        # Derived bank: ship each DISTINCT base read's forward tokens and
        # quals ONCE; k-mer contexts and reverse-strand rows (= forward
        # arrays flipped, see _y_strand_arrays) are derived on device
        # inside _ov_prepare_device.  A reverse-strand row's base is the
        # stored copy's revcomp, deduplicated by sequence CONTENT so the
        # original and its stored revcomp share one bank row without
        # assuming anything about the seqs list layout.  Row id r + N
        # addresses bank row r reversed.
        rc_cache: dict = {}

        def fwd_base(i, comp):
            if not comp:
                return seqs[i]
            if i not in rc_cache:
                rc_cache[i] = seqs[i].revcomp()
            return rc_cache[i]

        base_index: dict = {}
        base_list: list = []
        row_key: dict = {}
        for (i, comp) in rows_keys:
            fs = fwd_base(i, comp)
            key = (fs.seq, fs.qual)
            r = base_index.get(key)
            if r is None:
                r = len(base_list)
                base_index[key] = r
                base_list.append(fs)
            row_key[(i, comp)] = (r, comp)
        NB = len(base_list)
        row_of = {
            k: r + (NB if comp else 0) for k, (r, comp) in row_key.items()
        }
        # pad the bank to the bucket quantum so every bucket's lp fits
        Lmax = round_up(max(len(fs.seq) for fs in base_list), 512)
        b_tok = np.zeros((NB, Lmax), np.int32)
        b_q = np.zeros((NB, Lmax), np.int32)
        b_hq = np.zeros(NB, bool)
        b_len = np.zeros(NB, np.int32)
        b_mf = np.zeros(NB, np.int32)
        for r, fs in enumerate(base_list):
            tok = fs.tokens()
            n = len(tok)
            b_tok[r, :n] = tok
            b_len[r] = n
            b_mf[r] = int(np.argmax(np.bincount(tok, minlength=4)))
            if fs.has_qual():
                b_q[r, :n] = fs.qual_scores()
                b_hq[r] = True
        bank = {
            "bank_tok": _narrow_int(b_tok, 4),
            "bank_q": _narrow_int(b_q, 94),
            "bank_hq": jnp.asarray(b_hq),
            "bank_len": jnp.asarray(b_len),
            "bank_mf": _narrow_int(b_mf, 4),
        }
        _stamp(f"bank built (NB={NB}, Lmax={Lmax})")

        ins_cache: dict = {}

        def insert_score(i, comp, strand):
            key = (i, comp, strand)
            if key not in ins_cache:
                tabs_s, _ = self._tables(strand)
                tok, _, _, q = _y_strand_arrays(seqs[i], self._tables(comp)[0])
                ins_cache[key] = _insert_score_sum(tabs_s, tok, q)
            return ins_cache[key]

        def chunk_host_arrays(chunk, wp):
            """Per-pair stream arrays of one dispatch chunk (host numpy;
            the bank rows carry the sequences themselves)."""
            B = len(chunk)
            member = np.zeros((B, wp), bool)
            n_segs = packed[(chunk[0][0], chunk[0][1])][1].shape[1]
            seg_d_lo = np.zeros((B, n_segs), np.int32)
            seg_start = np.zeros((B, n_segs), np.int32)
            seg_width = np.zeros((B, n_segs), np.int32)
            j_off = np.zeros(B, np.int32)
            for b, (nx, ny, yc, env) in enumerate(chunk):
                m1, sd, ss, sw, jo, _ = packed[(nx, ny)]
                member[b, : m1.shape[1]] = m1[0]
                seg_d_lo[b] = sd[0]
                seg_start[b] = ss[0]
                seg_width[b] = sw[0]
                j_off[b] = jo[0]
            return n_segs, {
                "x_row": np.asarray(
                    [row_of[(nx, False)] for nx, _, _, _ in chunk], np.int32
                ),
                "y_row": np.asarray(
                    [row_of[(ny, yc)] for _, ny, yc, _ in chunk], np.int32
                ),
                "x_len": np.asarray(
                    [len(seqs[nx].seq) for nx, _, _, _ in chunk], np.int32
                ),
                "y_len": np.asarray(
                    [len(seqs[ny].seq) for _, ny, _, _ in chunk], np.int32
                ),
                # bit-packed: [B, wp] bool was the dominant per-chunk
                # device upload (~B*wp bytes through the ~10 MB/s tunnel)
                "member_packed": np.packbits(
                    member, axis=1, bitorder="little"
                ),
                "seg_d_lo": seg_d_lo,
                "seg_start": seg_start,
                "seg_width": seg_width,
                "j_off": j_off,
                "x_insert_score": np.asarray(
                    [insert_score(nx, False, yc) for nx, _, yc, _ in chunk]
                ),
                "y_insert_score": np.asarray(
                    [insert_score(ny, yc, yc) for _, ny, yc, _ in chunk]
                ),
            }

        scored = {}
        seg_scored = {}
        if self.mesh is not None:
            self._mesh_overlap_scores(buckets, bank, chunk_host_arrays,
                                      max_batch, OV_VMEM_CELLS, scored)
            buckets = {}
        # Exact-pass pool, created BEFORE the kernel dispatches: wide
        # pairs and (at -inf threshold) single-strip pairs need no
        # kernel scores, so their f64 fills start now and run under the
        # dispatch/fetch latency.  With the native path available the
        # pool is one-thread-per-core and tasks are ~12-pair slices:
        # native-fill-bound items (wide strips, GIL released) and
        # Python-bound items (tiny diagonal-0 strips, string building)
        # interleave across the workers, hiding the GIL work under the
        # fills instead of serialising the two classes back to back.
        # (When `streamed`, the pool already exists and the wide/single
        # jobs were submitted DURING prep.)
        if (
            not streamed
            and self.mesh is None
            and (buckets or wide_pairs or single_set)
        ):
            # prebuild every strand's tables on the main thread BEFORE the
            # pool exists: workers call _tables() inside fill jobs, and the
            # lazy rev-strand build is not thread-safe (a racing reader can
            # observe tables_rev set while _tdev_rev is still None)
            for yc in {j[2] for j in jobs}:
                self._tables(yc)
            exact_ex = ThreadPoolExecutor(
                (os.cpu_count() or 1) if use_shared_pool else 1
            )
            wide_jobs = [j for j in jobs if (j[0], j[1]) in wide_pairs]
            single_jobs = [j for j in jobs if (j[0], j[1]) in single_set]
            if use_shared_pool:
                if wide_jobs:
                    _submit_path_jobs("wide", wide_jobs)
                if single_jobs:
                    _submit_path_jobs("single", single_jobs)
            else:
                if wide_jobs:
                    # no kernel scores needed: start these fills first
                    exact_futs.append(
                        exact_ex.submit(_exact_timed, "wide", seqs, wide_jobs)
                    )
                # chunked so the incremental writer below can drain early
                # futures while later ones still fill
                for i in range(0, len(single_jobs), 96):
                    sj = single_jobs[i : i + 96]
                    exact_futs.append(
                        exact_ex.submit(
                            _exact_timed, f"single{i}+{len(sj)}", seqs, sj
                        )
                    )

        pending = []  # (chunk, score_dev, seg_dev): fetch AFTER all dispatches
        n_js_total = sum(len(js) for js in buckets.values())
        # widest (per-pair most expensive in the exact pass) tier first:
        # its scores then land first and its f64 fills — the longest
        # pole of the pipelined exact pass — start earliest
        for (y_comp, wp, lp), js in sorted(
            buckets.items(), key=lambda kv: (-kv[0][1] * kv[0][2], kv[0])
        ):
            tables, _ = self._tables(y_comp)
            # bucket merging above coalesces same-shape chunks, so the
            # dispatch slice must re-apply the VMEM cap: the padded batch
            # quantum times wp may not exceed the scoped-VMEM budget
            # (max_batch alone allowed e.g. 128x1152, the observed
            # overflow shape)
            bcap = 8
            while bcap * 2 <= max_batch and bcap * 2 * wp <= OV_VMEM_CELLS:
                bcap *= 2
            # pipeline split (round 4): the exact pass overlaps the
            # device work per drained chunk, so one giant dispatch
            # serialises host behind device — aim for ~4 dispatches
            # across the pass (each still pow2-padded, so the compile
            # shape count does not grow)
            target = int(os.environ.get("QUAFF_OV_PIPELINE_CHUNKS", "4"))
            if target > 1 and len(js) >= 2 * 8:
                want = pow2ceil(max((n_js_total + target - 1) // target, 8))
                if want < bcap:
                    bcap = want
            for i in range(0, len(js), bcap):
                chunk = js[i : i + bcap]
                # pad B to a power-of-two quantum (repeat the last pair;
                # its extra scores are discarded) so distinct chunk
                # sizes don't each compile a fresh kernel shape
                bq = pow2ceil(len(chunk))
                chunk = chunk + [chunk[-1]] * (bq - len(chunk))
                n_segs, host_d = chunk_host_arrays(chunk, wp)
                d = dict(bank)
                d.update({k: jnp.asarray(v) for k, v in host_d.items()})
                packed_dev = overlap_scores_kernel(
                    tables, d, n_rows=lp, return_segments=True,
                    interpret=_ov_interpret(), defer_fetch=True,
                )
                # JAX dispatch is async; a fetch here would serialize every
                # chunk on the device link RTT.  Defer to one drain below.
                _stamp(f"submit B{bq}xW{wp}xL{lp} comp={y_comp}")
                pending.append((chunk, n_segs, packed_dev))
        # Incremental drain + PIPELINED exact pass (round 4): as each
        # kernel chunk's scores land, its above-threshold candidates' f64
        # fills start on the worker immediately, so the host exact pass
        # overlaps the remaining device dispatches/fetches instead of
        # waiting for the full drain.  slack covers the kernel's
        # exact-lse vs truncated-table difference.

        def chunk_cands(chunk):
            cc = []
            seen = set()
            for nx, ny, yc, env in chunk:
                if (nx, ny) in seen:
                    continue  # batch-pad repeats
                seen.add((nx, ny))
                sc = scored[(nx, ny)]
                if not math.isfinite(sc):
                    continue
                adj = sc - null_ll(nx) - null_ll(ny, yc)
                if adj < printer.log_odds_threshold - slack:
                    continue
                cc.append((nx, ny, yc, env))
            return cc

        # start every chunk's device->host transfer before draining: the
        # tunnelled runtime pays a full RTT per blocking fetch otherwise
        for _, _, packed_dev in pending:
            try:
                packed_dev.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                break
        for chunk, n_segs, packed_dev in pending:
            fetched = np.asarray(packed_dev, dtype=np.float64)
            _stamp(f"fetch B{len(chunk)}")
            B = len(chunk)
            s = fetched[:B]
            segs = fetched[B:].reshape(B, n_segs)
            for b, (nx, ny, yc, env) in enumerate(chunk):
                scored[(nx, ny)] = float(s[b])
                seg_scored[(nx, ny)] = segs[b]
            if exact_ex is not None:
                cc = chunk_cands(chunk)
                if cc:
                    snap = {
                        (nx, ny): seg_scored[(nx, ny)]
                        for nx, ny, _, _ in cc
                    }
                    if use_shared_pool:
                        _submit_path_jobs(f"n{len(cc)}", cc,
                                          seg_scores=snap)
                    else:
                        exact_futs.append(
                            exact_ex.submit(
                                _exact_timed, f"n{len(cc)}", seqs, cc,
                                seg_scores=snap,
                            )
                        )

        # On a multi-host mesh run only host 0 writes output; the other
        # hosts stop after the (collective) scoring phase — the exact
        # pass below is pure host work
        if self.mesh is not None:
            from .parallel.distributed import is_primary

            if not is_primary():
                return

        slackless = printer.log_odds_threshold - slack
        cands = []
        for job in jobs:
            nx, ny, y_comp, env = job
            if (nx, ny) in wide_pairs or (nx, ny) in single_set:
                # unscored (band beyond the kernel budgets, or a
                # single-strip pair at -inf threshold): always take the
                # exact pass, in pair order
                cands.append(job)
                continue
            sc = scored[(nx, ny)]
            if not math.isfinite(sc):
                continue
            adj = sc - null_ll(nx) - null_ll(ny, y_comp)
            if adj < slackless:
                continue
            cands.append(job)
        _stamp("gather")
        if exact_ex is not None:
            # incremental write: the pool is multi-worker with
            # heaviest-first task sorting, so futures do NOT complete in
            # submission order — but f.result() below WAITS in submission
            # order, which is all the ordered flush relies on.  After
            # each future lands, flush every leading candidate whose
            # alignment is now known so the (serial, GIL-bound)
            # formatting overlaps the remaining native fills instead of
            # running as a pure tail.  (Do not refactor to as_completed:
            # ordered flushing would break.)
            results = {}
            cursor = 0
            for f in exact_futs:
                results.update(f.result())
                while cursor < len(cands):
                    key = (cands[cursor][0], cands[cursor][1])
                    if key not in results:
                        break
                    a = results[key]
                    if a is not None:
                        if isinstance(a, tuple):  # deferred render
                            a = self._render_path(seqs, a)
                        printer.write_alignment(out, a)
                    cursor += 1
            exact_ex.shutdown()
        else:
            results = self._exact_pass(seqs, cands, seg_scores=seg_scored)
            cursor = 0
        _stamp("exact gathered")
        for nx, ny, y_comp, env in cands[cursor:]:
            a = results[(nx, ny)]
            if a is not None:
                if isinstance(a, tuple):  # deferred render
                    a = self._render_path(seqs, a)
                printer.write_alignment(out, a)
        _stamp("write done")

    def _mesh_overlap_scores(self, buckets, bank, chunk_host_arrays,
                             max_batch, OV_VMEM_CELLS, scored) -> None:
        """-mesh pair scoring: the fused overlap scorer runs D chunks at
        a time inside shard_map over the device mesh (the pod-scale
        analogue of the overlap scheduler's task farming,
        qoverlap.cpp:554-566).  Chunks are grouped by identical padded
        shape (strand, width, rows, padded batch) so every device runs
        one program; short groups repeat their last chunk; the sequence
        bank replicates (P()) while per-pair streams shard over dp.
        Scores are allgathered to every host of a multi-host cluster;
        per-strip maxima are not computed here, so the exact pass fills
        every strip of each candidate (same output, slightly more f64
        fill work)."""
        from jax.sharding import PartitionSpec as P

        from .parallel.distributed import global_array
        from .parallel.estep import gather_scores, sharded_overlap_kernel

        D = self.mesh.devices.size
        bank_g = {
            k: global_array(self.mesh, P(), np.asarray(v))
            for k, v in bank.items()
        }
        groups: dict = {}
        for (y_comp, wp, lp), js in sorted(buckets.items()):
            bcap = 8
            while bcap * 2 <= max_batch and bcap * 2 * wp <= OV_VMEM_CELLS:
                bcap *= 2
            for i in range(0, len(js), bcap):
                chunk = js[i : i + bcap]
                bq = pow2ceil(len(chunk))
                chunk = chunk + [chunk[-1]] * (bq - len(chunk))
                groups.setdefault((y_comp, wp, lp, bq), []).append(chunk)
        for (y_comp, wp, lp, bq), glist in sorted(groups.items()):
            tables, _ = self._tables(y_comp)
            for g0 in range(0, len(glist), D):
                gset = glist[g0 : g0 + D]
                padded = gset + [gset[-1]] * (D - len(gset))
                host_ds = [chunk_host_arrays(c, wp)[1] for c in padded]
                stacked = {
                    k: global_array(
                        self.mesh, P("dp"),
                        np.stack([d[k] for d in host_ds]),
                    )
                    for k in host_ds[0]
                }
                s = gather_scores(
                    sharded_overlap_kernel(
                        self.mesh, tables, stacked, n_rows=lp,
                        interpret=_ov_interpret(), bank=bank_g,
                    )
                )
                for chunk, srow in zip(gset, np.asarray(s, np.float64)):
                    for (nx, ny, yc, env), sc in zip(chunk, srow):
                        scored[(nx, ny)] = float(sc)

    def _path_worker(self, seqs, x_cache, y_cache, jobs, render=True):
        """Per-item exact-path work callable over SHARED lazy caches.

        Strand score tables are prebuilt here (their lazy build is not
        thread-safe); the per-(seq, strand) array caches fill lazily and
        tolerate concurrent duplicate computes (values are deterministic
        — a racing write just overwrites with an equal value), so one
        (x_cache, y_cache) pair can back work items spread across many
        pool tasks.

        render=False returns raw traceback payloads instead of Alignment
        objects (finish with _render_path).  Pool workers use this: the
        string building is GIL-bound, and with 4 workers cycling
        [native fill, GIL-free] -> [render, GIL] the GIL demand sits
        near 100% duty and the fills stall waiting to reacquire it
        (measured 2.1x per-call wall inflation, ~2.1/4 core utilisation
        at N=64).  Rendering on the main-thread writer loop instead
        overlaps it with the fills without contending for workers'
        GIL slots."""
        from .dp.traceback import _cols_to_str
        from .native import (
            _overlap_tabs,
            overlap_strip_score_native,
            overlap_viterbi_path_cols,
            overlap_viterbi_path_cols_batch,
        )

        for (nx, ny, yc, env), _ in jobs:
            _overlap_tabs(self._tables(yc)[0])
            self._null_ll(seqs[nx])
            self._null_ll(seqs[ny], yc)

        def get_x(nx, yc):
            v = x_cache.get((nx, yc))
            if v is None:
                tables = self._tables(yc)[0]
                x = seqs[nx]
                x_tok = x.tokens()
                x_q = x.qual_scores() if x.has_qual() else None
                v = (
                    x.kmers(tables.match_kmer_len),
                    np.concatenate([[0], x.kmers(tables.indel_kmer_len)]),
                    x_q,
                    _insert_score_sum(tables, x_tok, x_q),
                )
                x_cache[(nx, yc)] = v
            return v

        def get_y(ny, yc):
            v = y_cache.get((ny, yc))
            if v is None:
                tables = self._tables(yc)[0]
                y_tok, y_mk, y_ik_raw, y_q = _y_strand_arrays(
                    seqs[ny], tables
                )
                v = (
                    y_mk,
                    np.concatenate([[0], y_ik_raw]),
                    y_q,
                    _insert_score_sum(tables, y_tok, y_q),
                )
                y_cache[(ny, yc)] = v
            return v

        def pick(item):
            """Winner strip + the per-call argument tuple for one item."""
            (nx, ny, yc, env), strips = item
            tables = self._tables(yc)[0]
            x_mk, x_ik_pad, x_q, x_ins = get_x(nx, yc)
            y_mk, y_ik_pad, y_q, y_ins = get_y(ny, yc)
            x_len = len(seqs[nx].seq)
            y_len = len(seqs[ny].seq)
            best = 0
            if len(strips) > 1:
                best_sc = None
                for k, (s, off, rows) in enumerate(strips):
                    end = overlap_strip_score_native(
                        x_mk, x_ik_pad, x_q, x_len, x_q is not None,
                        y_mk, y_ik_pad, y_q, y_len, y_q is not None,
                        off, rows, s.band_lo, s.band_width,
                        s.member_mask(), tables,
                    )
                    # same summed-score comparison (and first-wins tie
                    # order) as the matrix path's res["score"] argmax
                    sc = (end + x_ins) + y_ins
                    if best_sc is None or sc > best_sc:
                        best_sc, best = sc, k
            s, off, rows = strips[best]
            return (nx, ny, yc, x_ins, y_ins, (
                x_mk, x_ik_pad, x_q, x_len, x_q is not None,
                y_mk, y_ik_pad, y_q, y_len, y_q is not None,
                off, rows, s.band_lo, s.band_width, s.member_mask(),
                tables,
            ))

        def emit(nx, ny, yc, x_ins, y_ins, cols, end):
            score = (end + x_ins) + y_ins
            if cols is None or not math.isfinite(score):
                return (nx, ny), None
            if not render:
                return (nx, ny), (nx, ny, yc, cols, score)
            return (nx, ny), self._render_path(
                seqs, (nx, ny, yc, cols, score)
            )

        def work(item):
            nx, ny, yc, x_ins, y_ins, args = pick(item)
            cols, end = overlap_viterbi_path_cols(*args)
            return emit(nx, ny, yc, x_ins, y_ins, cols, end)

        def work_slice(items):
            """All items of a slice through ONE batched native call —
            the worker stays in GIL-free C for the whole slice's fills
            instead of reacquiring the GIL 30-argument-marshalling
            per task (the measured 4-thread scaling limiter)."""
            picks = [pick(item) for item in items]
            res = overlap_viterbi_path_cols_batch([p[5] for p in picks])
            return dict(
                emit(nx, ny, yc, xi, yi, cols, end)
                for (nx, ny, yc, xi, yi, _), (cols, end)
                in zip(picks, res)
            )

        work.slice = work_slice
        return work

    def _render_path(self, seqs, payload):
        """Alignment object from a _path_worker(render=False) payload —
        the GIL-bound half of the exact pass, run on the main-thread
        writer loop so it overlaps the pool's native fills."""
        from .dp.traceback import _cols_to_str

        nx, ny, yc, cols, score = payload
        x, y = seqs[nx], seqs[ny]
        col_x, col_y, x_start, x_end, y_start, y_end = cols
        row_x = FastSeq(
            name="read_x", comment=f"substr({x.name},{x_start}..{x_end})"
        )
        row_y = FastSeq(
            name="read_y", comment=f"substr({y.name},{y_start}..{y_end})"
        )
        row_x.seq = _cols_to_str(col_x, x.seq, GAP_CHAR)
        row_y.seq = _cols_to_str(col_y, y.seq, GAP_CHAR)
        if x.has_qual():
            row_x.qual = _cols_to_str(col_x, x.qual, "~")
        if y.has_qual():
            row_y.qual = _cols_to_str(col_y, y.qual, "~")
        row_x.source = SeqIntervalCoords(
            x.name, x_start, x_end, False
        ).compose(x.source)
        row_y.source = SeqIntervalCoords(
            y.name, y_start, y_end, False
        ).compose(y.source)
        a = Alignment(gapped_seq=[row_x, row_y], score=score)
        a.score -= self._null_ll(x) + self._null_ll(y, yc)
        return a

    def _strip_jobs(self, seqs, cands, max_segs=None, seg_scores=None,
                    seg_slack: float = 0.25) -> list:
        """Strip selection for the exact pass: each candidate becomes
        (job, [(strip, row_off, rows), ...]) with only the strips that
        can supply the winning traceback.  When the kernel's per-strip
        end maxima are available (seg_scores, pack_strips order — see
        overlap_scores_kernel return_segments), only strips within
        seg_slack nats of the pair's best strip are kept: the
        non-winning strips (typically the always-included diagonal-0
        strip, diagenv.cpp:53) never supply the traceback, so their f64
        fills are pure waste."""
        from .dp.pallas_overlap import MAX_SEGS
        from .envelope import pack_strips

        if max_segs is None:
            # must match the kernel's packing for seg_scores to line up
            max_segs = MAX_SEGS
        jobs: list = []
        for job in cands:
            nx, ny, y_comp, env = job
            x_len, y_len = len(seqs[nx].seq), len(seqs[ny].seq)
            segs = pack_strips(env, max_segs)
            keep = range(len(segs))
            if seg_scores is not None and (nx, ny) in seg_scores:
                sm = seg_scores[(nx, ny)]
                best = max(
                    (sm[k] for k in range(len(segs))), default=-math.inf
                )
                if math.isfinite(best):
                    keep = [
                        k for k in range(len(segs))
                        if sm[k] >= best - seg_slack
                    ]
            strips = []
            for k in keep:
                s = segs[k]
                # live row window of the strip: member diagonal d has
                # cells at rows j with 1 <= d + j <= x_len
                d1, d2 = int(s.diagonals[0]), int(s.diagonals[-1])
                j0 = max(1, 1 - d2)
                rows = max(min(y_len, x_len - d1) - j0 + 1, 1)
                strips.append((s, j0 - 1, rows))
            jobs.append((job, strips))
        return jobs

    def _exact_pass(self, seqs, cands, max_segs: int = None,
                    max_elems: int = 20_000_000, seg_scores: dict = None,
                    seg_slack: float = 0.25) -> dict:
        """Batched f64 parity fills for the candidate pairs, one batch row
        per envelope STRIP rather than per bounding band: the always-
        included diagonal 0 (diagenv.cpp:53) routinely leaves the seed
        cluster thousands of diagonals away, so the bounding band is
        mostly gap lanes the reference's ragged storage never touches.
        Strips are independent DP subproblems (envelope.strips), so the
        pair score is the max of its strip scores and the traceback runs
        inside the winning strip.  Candidates are bucketed by padded
        shape and chunked whole (all strips of a pair in one fill) so a
        chunk's matrices can be dropped as soon as its pairs finish.

        When the kernel's per-strip end maxima are available (seg_scores,
        pack_strips order — see overlap_scores_kernel return_segments),
        only strips within seg_slack nats of the pair's best strip are
        filled: the non-winning strips (typically the always-included
        diagonal-0 strip, diagenv.cpp:53) never supply the traceback, so
        their f64 matrices are pure waste."""
        def round_up(v, m):
            return ((v + m - 1) // m) * m

        results: dict = {}
        jobs = self._strip_jobs(seqs, cands, max_segs, seg_scores,
                                seg_slack)

        from .native import overlap_path_available

        if overlap_path_available():
            # matrix-free path: per-strip score-only fills pick each
            # pair's winner, then one checkpointed fill+traceback call
            # walks it — no DP matrices ever materialise (the stored
            # fill writes 3x the cells it reads back and is
            # store-bandwidth-bound, like the align winner pass)
            return self._exact_pass_path(seqs, jobs)

        buckets: dict = {}
        for (job, strips) in jobs:
            nx, ny, y_comp, env = job
            x_len, y_len = len(seqs[nx].seq), len(seqs[ny].seq)
            wp = round_up(max(max(s.band_width for s, _, _ in strips), 64), 64)
            key = (
                y_comp,
                wp,
                round_up(max(r for _, _, r in strips), 512),
                round_up(x_len, 512),
            )
            buckets.setdefault(key, []).append((job, strips))
        pending: list = []  # (chunk, y_comp, wp, lyp, lxp)
        for (y_comp, wp, lyp, lxp), js in sorted(buckets.items()):
            # cap the f64 matrix footprint (3 matrices x B x lyp x wp),
            # keeping each pair's strips within a single chunk
            max_b = max(1, int(max_elems // (lyp * wp)))
            chunk: list = []
            n_in_chunk = 0
            for job, strips in js:
                if chunk and n_in_chunk + len(strips) > max_b:
                    pending.append((chunk, y_comp, wp, lyp, lxp))
                    chunk = []
                    n_in_chunk = 0
                chunk.append((job, strips))
                n_in_chunk += len(strips)
            if chunk:
                pending.append((chunk, y_comp, wp, lyp, lxp))

        def fill_chunk(item):
            chunk, y_comp, wp, lyp, lxp = item
            tables, tdev = self._tables(y_comp)
            entries = [
                (seqs[j[0]], seqs[j[1]], s)
                for j, ss in chunk
                for s, _, _ in ss
            ]
            offs = [o for _, ss in chunk for _, o, _ in ss]
            ob = OverlapBatch(
                entries, tables, width=wp, max_x_len=lxp,
                row_off=offs, n_rows=lyp,
            )
            return self._exact_fill(ob, tables, tdev)

        def finish_chunk(item, res):
            chunk, y_comp, wp, lyp, lxp = item
            tables, _ = self._tables(y_comp)
            b = 0
            for (nx, ny, yc, env), ss in chunk:
                best_b, best_sc = b, float(res["score"][b])
                for k in range(1, len(ss)):
                    sc = float(res["score"][b + k])
                    if sc > best_sc:
                        best_b, best_sc = b + k, sc
                s_env, s_off, _ = ss[best_b - b]
                results[(nx, ny)] = self._finish_pair(
                    seqs[nx], seqs[ny], yc, s_env, tables, res,
                    best_b, row_off=s_off,
                )
                b += len(ss)

        # -threads N parallelises the f64 chunk fills (the native fill
        # releases the GIL), windowed to bound in-flight matrices;
        # finish stays sequential in chunk order
        if self.config.threads > 1 and len(pending) > 1:
            from concurrent.futures import ThreadPoolExecutor

            for yc in {it[1] for it in pending}:
                self._tables(yc)  # lazy strand-table build isn't thread-safe

            T = self.config.threads
            with ThreadPoolExecutor(T) as ex:
                futs: dict = {}
                for i, item in enumerate(pending):
                    futs[i] = ex.submit(fill_chunk, item)
                    if i >= T:
                        j = i - T
                        finish_chunk(pending[j], futs.pop(j).result())
                for j in sorted(futs):
                    finish_chunk(pending[j], futs.pop(j).result())
        else:
            for item in pending:
                finish_chunk(item, fill_chunk(item))
        return results

    def _exact_pass_path(self, seqs, jobs) -> dict:
        """Matrix-free exact pass: per pair, score-only f64 fills pick
        the winning strip (only when more than one strip survived the
        kernel's seg_slack cut), then ONE checkpointed fill+traceback
        native call (qdp_overlap_viterbi_path) walks it.  Every cell the
        walk reads is bitwise equal to the stored fill's, the winner
        comparison uses the same summed f64 scores in the same order,
        and the walk replicates qdp_overlap_traceback — output
        byte-identical to the matrix path (pinned by
        test_native.test_overlap_viterbi_path_*).  Cost ~2 score-fills
        per pair instead of 3x-stored fills of every kept strip; pairs
        parallelise across host cores (the native calls release the
        GIL), replacing the batched fill's internal per-pair pool."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        work = self._path_worker(seqs, {}, {}, jobs)

        results: dict = {}
        if len(jobs) > 1:
            with ThreadPoolExecutor(
                min(len(jobs), os.cpu_count() or 1)
            ) as ex:
                for key, a in ex.map(work, jobs):
                    results[key] = a
        else:
            for item in jobs:
                key, a = work(item)
                results[key] = a
        return results
