"""ctypes bindings for the native host-runtime library (libquaffio.so).

Provides fast gzip FASTA/FASTQ parsing, tokenisation and envelope
k-mer/diagonal seeding (see native/quaffio.cpp).  Falls back to the pure
Python implementations transparently when the shared library has not been
built; `make -C native` builds it.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _alloc_outputs(shapes) -> list:
    """Allocate f64 output buffers with MADV_HUGEPAGE suppressed.

    numpy madvises huge pages for allocations >= 4 MiB; with the kernel's
    THP defrag policy at `madvise` (the common default), first-touch of
    the fill matrices then runs synchronous page compaction in the fault
    path — measured 0.9-14.7 s stalls per ~66 MB DP-matrix allocation on
    an idle 128 GB host, vs ~100 ms with madvise off.  The matrices are
    short-lived scratch, so huge pages buy nothing here."""
    try:
        from numpy._core import multiarray as _ma

        prev = _ma._set_madvise_hugepage(False)
    except Exception:  # pragma: no cover - numpy internals moved
        _ma, prev = None, None
    try:
        return [np.empty(s, np.float64) for s in shapes]
    finally:
        if _ma is not None:
            _ma._set_madvise_hugepage(prev)


_TLS = None


def _alloc_outputs_reusable(shapes) -> list:
    """Per-thread grow-only arenas for the fill matrices: the pipelined
    align submits a fill chunk every few winners, and fresh np.empty
    buffers re-fault ~150 MB of pages per chunk (mmap'd anew each time).
    Each worker thread instead keeps one flat f64 arena per output slot
    and hands out reshaped views — pages fault once per thread, not once
    per chunk.  CALLER CONTRACT: the returned views of a thread are
    invalidated by that thread's next call (the aligner consumes each
    chunk's matrices before submitting another fill on the same
    worker)."""
    global _TLS
    if _TLS is None:
        import threading

        _TLS = threading.local()
    arenas = getattr(_TLS, "arenas", None)
    if arenas is None:
        arenas = _TLS.arenas = []
    out = []
    for i, s in enumerate(shapes):
        n = int(np.prod(s))
        if i >= len(arenas):
            arenas.append(_alloc_outputs([(n,)])[0])
        elif arenas[i].size < n:
            arenas[i] = _alloc_outputs([(max(n, arenas[i].size * 2),)])[0]
        out.append(arenas[i][:n].reshape(s))
    return out


def _lib_path() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "libquaffio.so"


def build_native(quiet: bool = True) -> bool:
    """Attempt to build the native library in place; returns success."""
    native_dir = pathlib.Path(__file__).parent.parent / "native"
    if not (native_dir / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            check=True,
            capture_output=quiet,
        )
        return _lib_path().exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib(auto_build: bool = False) -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    # A failed attempt is retried if the library has appeared since (a
    # fresh checkout latches the miss before test_native builds the .so).
    if _LIB_TRIED and not auto_build and not path.exists():
        return None
    _LIB_TRIED = True
    if not path.exists() and auto_build:
        build_native()
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    lib.qio_open.restype = ctypes.c_void_p
    lib.qio_open.argtypes = [ctypes.c_char_p]
    lib.qio_error.restype = ctypes.c_char_p
    lib.qio_error.argtypes = [ctypes.c_void_p]
    lib.qio_num_seqs.restype = ctypes.c_int64
    lib.qio_num_seqs.argtypes = [ctypes.c_void_p]
    for fn in ("qio_name", "qio_comment", "qio_seq", "qio_qual"):
        getattr(lib, fn).restype = ctypes.c_char_p
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
    for fn in ("qio_seq_len", "qio_qual_len", "qio_filepos"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.qio_close.restype = None
    lib.qio_close.argtypes = [ctypes.c_void_p]
    lib.qio_tokenize.restype = ctypes.c_int64
    lib.qio_tokenize.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.qio_diag_kmer_counts.restype = ctypes.c_int64
    lib.qio_diag_kmer_counts.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    if hasattr(lib, "qio_diag_kmer_index"):
        i32p_ = ctypes.POINTER(ctypes.c_int32)
        i64p_ = ctypes.POINTER(ctypes.c_int64)
        lib.qio_diag_kmer_index.restype = None
        lib.qio_diag_kmer_index.argtypes = [
            i32p_, ctypes.c_int64, ctypes.c_int32, i32p_, i32p_,
        ]
        lib.qio_diag_kmer_counts_indexed.restype = ctypes.c_int64
        lib.qio_diag_kmer_counts_indexed.argtypes = [
            i32p_, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            i32p_, i32p_, i64p_, i64p_,
        ]
    if hasattr(lib, "qref_lse_chain"):
        lib.qref_lse_chain.restype = None
        lib.qref_lse_chain.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
    if hasattr(lib, "qdp_overlap_fill"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        ov_common = [
            i32p, i32p, i32p, i64, ctypes.c_int32,  # x side
            i32p, i32p, i32p, i64, ctypes.c_int32,  # y side
            i64, i64,  # j_off, n_rows
            i64, i64, u8p,  # d_lo, W, member
            f64p, f64p, f64p, f64p, i64, i64,  # pair tables, Km, Q
            f64p, f64p, f64p, i64,  # m2m/m2i/m2d, Ki
            f64p,  # trans6
        ]
        lib.qdp_overlap_fill.restype = None
        lib.qdp_overlap_fill.argtypes = ov_common + [
            f64p, f64p, f64p, f64p,  # mat, ins, del, end
        ]
        if hasattr(lib, "qdp_overlap_score"):
            lib.qdp_overlap_score.restype = None
            lib.qdp_overlap_score.argtypes = ov_common + [f64p]
    if hasattr(lib, "qdp_viterbi_traceback"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        f64 = ctypes.c_double
        lib.qdp_viterbi_traceback.restype = i64
        lib.qdp_viterbi_traceback.argtypes = [
            i32p, i64,  # x_tok, x_len
            i32p, i32p, i32p, i32p, i64, ctypes.c_int32,  # y side
            i64, i64, i64,  # n_rows, d_lo, W
            f64p, f64p, f64p, f64p, i64, i64,  # emission tables, Km, Q
            f64p, f64p, f64p, f64p,  # m2m/m2i/m2d/m2e
            f64, f64, f64, f64,  # d2d, d2m, i2i, i2m
            ctypes.c_int32,  # local
            f64p, f64p, f64p,  # mat, ins, del
            i32p, i32p, i64p,  # col_x, col_y, bounds
        ]
        lib.qdp_overlap_traceback.restype = i64
        lib.qdp_overlap_traceback.argtypes = [
            i32p, i32p, i32p, i64, ctypes.c_int32,  # x side
            i32p, i32p, i32p, i64, ctypes.c_int32,  # y side
            i64, i64,  # row_off, n_rows
            i64, i64,  # d_lo, W
            f64p, f64p, f64p, f64p, i64, i64,  # pair tables, Km, Q
            f64p, f64p, f64p, i64,  # m2m/m2i/m2d, Ki
            f64p,  # trans6
            f64p, f64p, f64p,  # mat, ins, del
            i32p, i32p, i64p,  # col_x, col_y, bounds
        ]
    if hasattr(lib, "qdp_overlap_viterbi_path"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        lib.qdp_overlap_viterbi_path.restype = i64
        lib.qdp_overlap_viterbi_path.argtypes = [
            i32p, i32p, i32p, i64, ctypes.c_int32,  # x side
            i32p, i32p, i32p, i64, ctypes.c_int32,  # y side (FULL arrays)
            i64, i64,  # j_off, n_rows
            i64, i64, u8p,  # d_lo, W, member
            f64p, f64p, f64p, f64p, i64, i64,  # pair tables, Km, Q
            f64p, f64p, f64p, i64,  # m2m/m2i/m2d, Ki
            f64p,  # trans6
            f64p,  # end out
            i32p, i32p, i64p,  # col_x, col_y, bounds
        ]
    if hasattr(lib, "qdp_overlap_viterbi_path_batch"):
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.qdp_overlap_viterbi_path_batch.restype = None
        lib.qdp_overlap_viterbi_path_batch.argtypes = [
            ctypes.c_int64,  # n_tasks
            u64p,  # xyptr [n,7]
            i64p,  # geom [n,6]
            ctypes.POINTER(ctypes.c_int32),  # hasq [n,2]
            u64p,  # tabptr [n,8]
            i64p,  # tabdim [n,3]
            u64p,  # colptr [n,2]
            ctypes.POINTER(ctypes.c_double),  # end_out [n]
            i64p,  # bounds [n,4]
            i64p,  # ret [n]
        ]
    if hasattr(lib, "qdp_align_viterbi_path"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        f64 = ctypes.c_double
        lib.qdp_align_viterbi_path.restype = i64
        lib.qdp_align_viterbi_path.argtypes = [
            i32p, i64,  # x_tok, x_len
            i32p, i32p, i32p, i32p, i64, ctypes.c_int32,  # y side
            i64, i64, u8p,  # d_lo, W, member
            f64p, f64p, f64p, f64p, i64, i64,  # emission tables, Km, Q
            f64p, f64p, f64p, f64p,  # m2m/m2i/m2d/m2e
            f64, f64, f64, f64,  # d2d, d2m, i2i, i2m
            ctypes.c_int32,  # local
            f64p,  # score out
            i32p, i32p, i64p,  # col_x, col_y, bounds
        ]
    if hasattr(lib, "qdp_align_fill"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        f64 = ctypes.c_double
        common = [
            i32p, i64,  # x_tok, x_len
            i32p, i32p, i32p, i32p, i64, ctypes.c_int32,  # y side
            i64,  # n_rows
            i64, i64, u8p,  # d_lo, W, member
            f64p, f64p, f64p, f64p, i64, i64,  # emission tables, Km, Q
            f64p, f64p, f64p, f64p,  # m2m/m2i/m2d/m2e
            f64, f64, f64, f64,  # d2d, d2m, i2i, i2m
            ctypes.c_int32, ctypes.c_int32,  # mode, local
        ]
        lib.qdp_align_fill.restype = None
        lib.qdp_align_fill.argtypes = common + [
            f64p, f64p, f64p, f64p,  # mat, ins, del, end
        ]
        if hasattr(lib, "qdp_align_score"):
            lib.qdp_align_score.restype = None
            lib.qdp_align_score.argtypes = common + [f64p]  # end only
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def read_fast_seqs_native(filename: str) -> Optional[List["FastSeq"]]:
    """Parse a sequence file with the native parser; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from .io.fastseq import FastSeq

    h = lib.qio_open(filename.encode())
    try:
        err = lib.qio_error(h)
        if err:
            raise IOError(f"{filename}: {err.decode()}")
        n = lib.qio_num_seqs(h)
        out: List[FastSeq] = []
        for i in range(n):
            seq_len = lib.qio_seq_len(h, i)
            qual_len = lib.qio_qual_len(h, i)
            rec = FastSeq(
                name=lib.qio_name(h, i).decode("latin-1"),
                comment=lib.qio_comment(h, i).decode("latin-1"),
                seq=ctypes.string_at(lib.qio_seq(h, i), seq_len).decode("latin-1"),
                qual=ctypes.string_at(lib.qio_qual(h, i), qual_len).decode("latin-1")
                if qual_len == seq_len and seq_len > 0
                else "",
                filename=filename,
                filepos=lib.qio_filepos(h, i),
            )
            out.append(rec)
        return out
    finally:
        lib.qio_close(h)


def tokenize_native(seq: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = seq.encode("latin-1")
    out = np.empty(len(buf), dtype=np.int32)
    bad = lib.qio_tokenize(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    if bad >= 0:
        raise ValueError(f"Unknown symbol {seq[bad]} in sequence")
    return out


def ref_lse_chain_native(acc: np.ndarray, terms: np.ndarray) -> bool:
    """Run the ordered truncated-lse chain in C (qref_lse_chain), updating
    acc in place.  acc must be contiguous f64; terms is
    [n_steps, *acc.shape].  Returns False when the library is missing."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qref_lse_chain"):
        return False
    t = np.ascontiguousarray(terms, np.float64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.qref_lse_chain(
        acc.ctypes.data_as(f64p), t.ctypes.data_as(f64p),
        int(t.shape[0]), int(acc.size),
    )
    return True


def overlap_fill_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "qdp_overlap_fill")


def _overlap_tabs(tables) -> dict:
    """Contiguous f64 table arrays for the native overlap calls, cached
    per OverlapScoreTables instance."""
    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        def c64(a):
            return np.ascontiguousarray(a, dtype=np.float64)

        tabs = {
            "pair_qq": c64(tables.pair_qq),
            "pair_xq": c64(tables.pair_xq),
            "pair_yq": c64(tables.pair_yq),
            "pair_nn": c64(tables.pair_nn),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "trans": np.array(
                [tables.i2m_eff, tables.i2i_eff, tables.i2d_eff,
                 tables.d2m_eff, tables.d2i_eff, tables.d2d_eff],
                dtype=np.float64,
            ),
        }
        tables._native_tabs = tabs
    return tabs


def overlap_fill_native(batch, tables) -> Optional[dict]:
    """Exact banded overlap fill for an OverlapBatch via the native
    engine (native/overlapdp.cpp), one C call per pair on a thread pool
    (ctypes releases the GIL).  Same contract as dp.overlap.overlap_fill
    with return_matrices=True: {"score" [B], "end" [B],
    "mat"/"ins"/"del" [B, R+1, W] float64}.  None if the library is not
    built."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_overlap_fill"):
        return None
    from concurrent.futures import ThreadPoolExecutor
    import os

    base = batch.base
    B, W = base.member.shape
    R = base.max_y_len
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def c64(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    # table arrays cached per OverlapScoreTables instance
    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        tabs = {
            "pair_qq": c64(tables.pair_qq),
            "pair_xq": c64(tables.pair_xq),
            "pair_yq": c64(tables.pair_yq),
            "pair_nn": c64(tables.pair_nn),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "trans": np.array(
                [tables.i2m_eff, tables.i2i_eff, tables.i2d_eff,
                 tables.d2m_eff, tables.d2i_eff, tables.d2d_eff],
                dtype=np.float64,
            ),
        }
        tables._native_tabs = tabs
    Km = tabs["pair_qq"].shape[0]
    Q = tabs["pair_qq"].shape[2]
    Ki = tabs["m2m"].shape[0]

    x_mk = np.ascontiguousarray(batch.x_match_kmer, np.int32)
    x_ik = np.ascontiguousarray(batch.x_indel_kmer_pad, np.int32)
    x_q = np.ascontiguousarray(batch.x_qual, np.int32)
    y_mk = np.ascontiguousarray(base.y_match_kmer, np.int32)
    y_ik = np.ascontiguousarray(base.y_indel_kmer_pad, np.int32)
    y_q = np.ascontiguousarray(base.y_qual, np.int32)
    member = np.ascontiguousarray(base.member, np.uint8)
    j_off = (
        batch.row_off if batch.row_off is not None else np.zeros(B, np.int32)
    )

    mat, ins, dele = _alloc_outputs([(B, R + 1, W)] * 3)
    end = np.empty(B, np.float64)

    def p32(a):
        return a.ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    def run(b):
        lib.qdp_overlap_fill(
            p32(x_mk[b]), p32(x_ik[b]), p32(x_q[b]),
            int(base.x_len[b]), int(batch.x_has_qual[b]),
            p32(y_mk[b]), p32(y_ik[b]), p32(y_q[b]),
            int(base.y_len[b]), int(base.y_has_qual[b]),
            int(j_off[b]), R,
            int(base.d_lo[b]), W, member[b].ctypes.data_as(u8p),
            p64(tabs["pair_qq"]), p64(tabs["pair_xq"]),
            p64(tabs["pair_yq"]), p64(tabs["pair_nn"]), Km, Q,
            p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]), Ki,
            p64(tabs["trans"]),
            p64(mat[b]), p64(ins[b]), p64(dele[b]),
            end[b:].ctypes.data_as(f64p),
        )

    if B == 1:
        run(0)
    else:
        with ThreadPoolExecutor(min(B, os.cpu_count() or 1)) as ex:
            list(ex.map(run, range(B)))

    score = end + batch.x_insert_score + batch.y_insert_score
    return {"score": score, "end": end, "mat": mat, "ins": ins, "del": dele}


def overlap_score_native(batch, tables):
    """Score-only exact overlap fills: end + full-sequence insert scores
    per pair ([B] float64), no matrices stored or allocated.  Identical
    arithmetic and op order to overlap_fill_native — scores are bitwise
    equal.  None if the library is not built."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_overlap_score"):
        return None
    import os
    from concurrent.futures import ThreadPoolExecutor

    base = batch.base
    B, W = base.member.shape
    R = base.max_y_len
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def c64(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        tabs = {
            "pair_qq": c64(tables.pair_qq),
            "pair_xq": c64(tables.pair_xq),
            "pair_yq": c64(tables.pair_yq),
            "pair_nn": c64(tables.pair_nn),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "trans": np.array(
                [tables.i2m_eff, tables.i2i_eff, tables.i2d_eff,
                 tables.d2m_eff, tables.d2i_eff, tables.d2d_eff],
                dtype=np.float64,
            ),
        }
        tables._native_tabs = tabs
    Km = tabs["pair_qq"].shape[0]
    Q = tabs["pair_qq"].shape[2]
    Ki = tabs["m2m"].shape[0]

    x_mk = np.ascontiguousarray(batch.x_match_kmer, np.int32)
    x_ik = np.ascontiguousarray(batch.x_indel_kmer_pad, np.int32)
    x_q = np.ascontiguousarray(batch.x_qual, np.int32)
    y_mk = np.ascontiguousarray(base.y_match_kmer, np.int32)
    y_ik = np.ascontiguousarray(base.y_indel_kmer_pad, np.int32)
    y_q = np.ascontiguousarray(base.y_qual, np.int32)
    member = np.ascontiguousarray(base.member, np.uint8)
    j_off = (
        batch.row_off if batch.row_off is not None else np.zeros(B, np.int32)
    )
    end = np.empty(B, np.float64)

    def p32(a):
        return a.ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    def run(b):
        lib.qdp_overlap_score(
            p32(x_mk[b]), p32(x_ik[b]), p32(x_q[b]),
            int(base.x_len[b]), int(batch.x_has_qual[b]),
            p32(y_mk[b]), p32(y_ik[b]), p32(y_q[b]),
            int(base.y_len[b]), int(base.y_has_qual[b]),
            int(j_off[b]), R,
            int(base.d_lo[b]), W, member[b].ctypes.data_as(u8p),
            p64(tabs["pair_qq"]), p64(tabs["pair_xq"]),
            p64(tabs["pair_yq"]), p64(tabs["pair_nn"]), Km, Q,
            p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]), Ki,
            p64(tabs["trans"]),
            end[b:].ctypes.data_as(f64p),
        )

    if B == 1:
        run(0)
    else:
        with ThreadPoolExecutor(min(B, os.cpu_count() or 1)) as ex:
            list(ex.map(run, range(B)))
    return end + batch.x_insert_score + batch.y_insert_score


def overlap_path_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "qdp_overlap_viterbi_path")


def overlap_strip_score_native(
    x_mk, x_ik_pad, x_q, x_len, x_has_qual,
    y_mk, y_ik_pad, y_q, y_len, y_has_qual,
    j_off, n_rows, d_lo, W, member, tables,
):
    """Score-only exact fill of ONE envelope strip (qdp_overlap_score)
    from per-pair full-length arrays — no OverlapBatch, no padding.  The
    y-side arrays are sliced here to the live row window exactly as
    OverlapBatch's row trimming does, so the end score is bitwise equal
    to the batched fill's.  Returns the raw end score (caller adds the
    full-sequence insert scores), or None if the library is missing."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_overlap_score"):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    tabs = _overlap_tabs(tables)
    Km = tabs["pair_qq"].shape[0]
    Q = tabs["pair_qq"].shape[2]
    Ki = tabs["m2m"].shape[0]

    o, n = int(j_off), int(n_rows)
    nn = max(0, min(n, int(y_len) - o))
    ymk_s = np.zeros(n, np.int32)
    ymk_s[:nn] = y_mk[o : o + nn]
    yq_s = np.zeros(n, np.int32)
    if y_q is not None:
        yq_s[:nn] = y_q[o : o + nn]
    yik_s = np.zeros(n + 1, np.int32)
    yik_s[: nn + 1] = y_ik_pad[o : o + nn + 1]
    member = np.ascontiguousarray(member, np.uint8)
    x_mk = np.ascontiguousarray(x_mk, np.int32)
    x_ik_pad = np.ascontiguousarray(x_ik_pad, np.int32)
    xq_a = np.ascontiguousarray(
        x_q if x_q is not None else np.zeros(max(int(x_len), 1)), np.int32
    )
    end = np.zeros(1, np.float64)

    def p32(a):
        return a.ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    lib.qdp_overlap_score(
        p32(x_mk), p32(x_ik_pad), p32(xq_a),
        int(x_len), int(bool(x_has_qual)),
        p32(ymk_s), p32(yik_s), p32(yq_s),
        int(y_len), int(bool(y_has_qual)),
        o, n,
        int(d_lo), int(W), member.ctypes.data_as(u8p),
        p64(tabs["pair_qq"]), p64(tabs["pair_xq"]),
        p64(tabs["pair_yq"]), p64(tabs["pair_nn"]), Km, Q,
        p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]), Ki,
        p64(tabs["trans"]),
        end.ctypes.data_as(f64p),
    )
    return float(end[0])


def overlap_viterbi_path_cols(
    x_mk, x_ik_pad, x_q, x_len, x_has_qual,
    y_mk, y_ik_pad, y_q, y_len, y_has_qual,
    j_off, n_rows, d_lo, W, member, tables,
):
    """Checkpointed overlap fill + traceback in one native call, per
    (pair, strip); no DP matrices ever materialise host-side.  y-side
    arrays are FULL-length.  Returns (cols, end) where cols is
    (col_x, col_y, x_start, x_end, y_start, y_end) or None when no
    finite end cell exists (no alignment), and end is the raw end score
    (bitwise equal to the stored fill's; caller adds insert scores).
    Returns None (not a tuple) if the library is missing.  Raises on a
    broken traceback, matching the Python walk."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_overlap_viterbi_path"):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    tabs = _overlap_tabs(tables)
    Km = tabs["pair_qq"].shape[0]
    Q = tabs["pair_qq"].shape[2]
    Ki = tabs["m2m"].shape[0]

    member = np.ascontiguousarray(member, np.uint8)
    x_mk = np.ascontiguousarray(x_mk, np.int32)
    x_ik_pad = np.ascontiguousarray(x_ik_pad, np.int32)
    xq_a = np.ascontiguousarray(
        x_q if x_q is not None else np.zeros(max(int(x_len), 1)), np.int32
    )
    y_mk = np.ascontiguousarray(y_mk, np.int32)
    y_ik_pad = np.ascontiguousarray(y_ik_pad, np.int32)
    yq_a = np.ascontiguousarray(
        y_q if y_q is not None else np.zeros(max(int(y_len), 1)), np.int32
    )
    cap = int(x_len) + int(y_len)
    col_x = np.empty(cap, np.int32)
    col_y = np.empty(cap, np.int32)
    bounds = np.zeros(4, np.int64)
    end = np.zeros(1, np.float64)

    def p32(a):
        return a.ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    n = lib.qdp_overlap_viterbi_path(
        p32(x_mk), p32(x_ik_pad), p32(xq_a),
        int(x_len), int(bool(x_has_qual)),
        p32(y_mk), p32(y_ik_pad), p32(yq_a),
        int(y_len), int(bool(y_has_qual)),
        int(j_off), int(n_rows),
        int(d_lo), int(W), member.ctypes.data_as(u8p),
        p64(tabs["pair_qq"]), p64(tabs["pair_xq"]),
        p64(tabs["pair_yq"]), p64(tabs["pair_nn"]), Km, Q,
        p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]), Ki,
        p64(tabs["trans"]),
        end.ctypes.data_as(f64p),
        col_x.ctypes.data_as(i32p), col_y.ctypes.data_as(i32p),
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n == -2:
        return (None, float(end[0]))
    if n < 0:
        raise RuntimeError("Traceback error: no finite source")
    return (
        (
            col_x[cap - n :], col_y[cap - n :],
            int(bounds[0]), int(bounds[1]),
            int(bounds[2]), int(bounds[3]),
        ),
        float(end[0]),
    )


def overlap_viterbi_path_cols_batch(tasks):
    """Batched overlap_viterbi_path_cols: ONE native call for a slice
    of tasks (qdp_overlap_viterbi_path_batch).  Each task is the same
    argument tuple the per-call wrapper takes:

        (x_mk, x_ik_pad, x_q|None, x_len, x_has_qual,
         y_mk, y_ik_pad, y_q|None, y_len, y_has_qual,
         j_off, n_rows, d_lo, W, member, tables)

    and the return is [(cols|None, end), ...] with per-element values
    identical to overlap_viterbi_path_cols.  The point is the exact
    pass's thread scaling: per-task ctypes marshalling (~30 argument
    conversions) and the GIL reacquisition after every native return
    capped 4 pool threads at ~2.3x serial; batching keeps workers in
    GIL-free native code for a whole slice (measured 3.9x in a
    GIL-free process control).  Falls back to per-call when the
    library lacks the symbol.  Raises on a broken traceback."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_overlap_viterbi_path_batch"):
        return [overlap_viterbi_path_cols(*t) for t in tasks]
    n = len(tasks)
    if n == 0:
        return []
    xyptr = np.empty((n, 7), np.uint64)
    geom = np.empty((n, 6), np.int64)
    hasq = np.empty((n, 2), np.int32)
    tabptr = np.empty((n, 8), np.uint64)
    tabdim = np.empty((n, 3), np.int64)
    colptr = np.empty((n, 2), np.uint64)
    end = np.zeros(n, np.float64)
    bounds = np.zeros((n, 4), np.int64)
    ret = np.zeros(n, np.int64)

    keep = []  # contiguous copies must outlive the native call
    tabs_cache: dict = {}
    caps = np.asarray(
        [int(t[3]) + int(t[8]) for t in tasks], np.int64
    )
    offs = np.concatenate([[0], np.cumsum(caps)])
    arena_x = np.empty(int(offs[-1]), np.int32)
    arena_y = np.empty(int(offs[-1]), np.int32)
    max_len = int(max(max(int(t[3]), int(t[8])) for t in tasks))
    zeros_q = np.zeros(max(max_len, 1), np.int32)  # shared no-qual row

    def contig(a, dt):
        c = np.ascontiguousarray(a, dt)
        if c is not a:
            keep.append(c)
        return c

    for i, t in enumerate(tasks):
        (x_mk, x_ik_pad, x_q, x_len, x_hq,
         y_mk, y_ik_pad, y_q, y_len, y_hq,
         j_off, n_rows, d_lo, W, member, tables) = t
        tkey = id(tables)
        tabs = tabs_cache.get(tkey)
        if tabs is None:
            tabs = tabs_cache[tkey] = _overlap_tabs(tables)
        xyptr[i, 0] = contig(x_mk, np.int32).ctypes.data
        xyptr[i, 1] = contig(x_ik_pad, np.int32).ctypes.data
        xyptr[i, 2] = (
            contig(x_q, np.int32) if x_q is not None else zeros_q
        ).ctypes.data
        xyptr[i, 3] = contig(y_mk, np.int32).ctypes.data
        xyptr[i, 4] = contig(y_ik_pad, np.int32).ctypes.data
        xyptr[i, 5] = (
            contig(y_q, np.int32) if y_q is not None else zeros_q
        ).ctypes.data
        xyptr[i, 6] = contig(member, np.uint8).ctypes.data
        geom[i] = (int(x_len), int(y_len), int(j_off), int(n_rows),
                   int(d_lo), int(W))
        hasq[i] = (int(bool(x_hq)), int(bool(y_hq)))
        for k, name in enumerate(
            ("pair_qq", "pair_xq", "pair_yq", "pair_nn",
             "m2m", "m2i", "m2d", "trans")
        ):
            tabptr[i, k] = tabs[name].ctypes.data
        tabdim[i] = (tabs["pair_qq"].shape[0], tabs["pair_qq"].shape[2],
                     tabs["m2m"].shape[0])
        colptr[i, 0] = arena_x.ctypes.data + int(offs[i]) * 4
        colptr[i, 1] = arena_y.ctypes.data + int(offs[i]) * 4

    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.qdp_overlap_viterbi_path_batch(
        n,
        xyptr.ctypes.data_as(u64p),
        geom.ctypes.data_as(i64p),
        hasq.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tabptr.ctypes.data_as(u64p),
        tabdim.ctypes.data_as(i64p),
        colptr.ctypes.data_as(u64p),
        end.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        bounds.ctypes.data_as(i64p),
        ret.ctypes.data_as(i64p),
    )

    out = []
    for i in range(n):
        ni = int(ret[i])
        if ni == -2:
            out.append((None, float(end[i])))
            continue
        if ni < 0:
            raise RuntimeError("Traceback error: no finite source")
        o, cap = int(offs[i]), int(caps[i])
        out.append((
            (
                arena_x[o + cap - ni : o + cap],
                arena_y[o + cap - ni : o + cap],
                int(bounds[i, 0]), int(bounds[i, 1]),
                int(bounds[i, 2]), int(bounds[i, 3]),
            ),
            float(end[i]),
        ))
    return out


def align_fill_native(batch, tables, mode: str = "viterbi",
                      local: bool = True, threads: Optional[int] = None,
                      reuse_buffers: bool = False) -> Optional[dict]:
    """Exact banded read-vs-ref fill for a PairBatch via the native
    engine, one C call per pair on a thread pool.  Same contract as
    dp.engine.dp_fill with return_matrices=True (host numpy).  None if
    the library is not built.

    threads caps the internal pool (default: one per core) — callers
    already running on a worker pool pass 1 to avoid oversubscription.
    reuse_buffers=True returns views of per-thread arenas instead of
    fresh allocations (see _alloc_outputs_reusable's caller contract)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_align_fill"):
        return None
    from concurrent.futures import ThreadPoolExecutor
    import os

    B, W = batch.member.shape
    R = batch.max_y_len
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def c64(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        tabs = {
            "match_score": c64(tables.match_score),
            "match_score_noq": c64(tables.match_score_noq),
            "insert_score": c64(tables.insert_score),
            "insert_score_noq": c64(tables.insert_score_noq),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "m2e": c64(tables.m2e),
        }
        tables._native_tabs = tabs
    Km = tabs["match_score"].shape[1]
    Q = tabs["match_score"].shape[2]

    x_tok = np.ascontiguousarray(batch.x_tok, np.int32)
    y_tok = np.ascontiguousarray(batch.y_tok, np.int32)
    y_mk = np.ascontiguousarray(batch.y_match_kmer, np.int32)
    y_ik = np.ascontiguousarray(batch.y_indel_kmer_pad, np.int32)
    y_q = np.ascontiguousarray(batch.y_qual, np.int32)
    member = np.ascontiguousarray(batch.member, np.uint8)

    alloc = _alloc_outputs_reusable if reuse_buffers else _alloc_outputs
    mat, ins, dele = alloc([(B, R + 1, W)] * 3)
    end = np.empty(B, np.float64)

    def p32(a):
        return a.ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    def run(b):
        lib.qdp_align_fill(
            p32(x_tok[b]), int(batch.x_len[b]),
            p32(y_tok[b]), p32(y_mk[b]), p32(y_ik[b]), p32(y_q[b]),
            int(batch.y_len[b]), int(batch.y_has_qual[b]),
            R,
            int(batch.d_lo[b]), W, member[b].ctypes.data_as(u8p),
            p64(tabs["match_score"]), p64(tabs["match_score_noq"]),
            p64(tabs["insert_score"]), p64(tabs["insert_score_noq"]),
            Km, Q,
            p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]),
            p64(tabs["m2e"]),
            float(tables.d2d), float(tables.d2m),
            float(tables.i2i), float(tables.i2m),
            0 if mode == "viterbi" else 1, int(bool(local)),
            p64(mat[b]), p64(ins[b]), p64(dele[b]),
            end[b:].ctypes.data_as(f64p),
        )

    n_threads = min(B, threads if threads else (os.cpu_count() or 1))
    if n_threads <= 1:
        for b in range(B):
            run(b)
    else:
        with ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(run, range(B)))

    return {"score": end, "mat": mat, "ins": ins, "del": dele}


def align_score_native(batch, tables, mode: str = "viterbi",
                       local: bool = True, threads: Optional[int] = None):
    """Score-only banded read-vs-ref fills for a PairBatch: returns the
    end scores [B] float64 (no matrices stored or allocated — 2 scratch
    rows per fill instead of 3*(R+1)*W doubles), one C call per pair on
    a thread pool.  In Viterbi mode scores are bitwise equal to
    align_fill_native's / the XLA engine's (max is exactly associative).
    None if the library is not built."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_align_score"):
        return None
    import os
    from concurrent.futures import ThreadPoolExecutor

    B, W = batch.member.shape
    R = batch.max_y_len
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def c64(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        tabs = {
            "match_score": c64(tables.match_score),
            "match_score_noq": c64(tables.match_score_noq),
            "insert_score": c64(tables.insert_score),
            "insert_score_noq": c64(tables.insert_score_noq),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "m2e": c64(tables.m2e),
        }
        tables._native_tabs = tabs
    Km = tabs["match_score"].shape[1]
    Q = tabs["match_score"].shape[2]

    x_tok = np.ascontiguousarray(batch.x_tok, np.int32)
    y_tok = np.ascontiguousarray(batch.y_tok, np.int32)
    y_mk = np.ascontiguousarray(batch.y_match_kmer, np.int32)
    y_ik = np.ascontiguousarray(batch.y_indel_kmer_pad, np.int32)
    y_q = np.ascontiguousarray(batch.y_qual, np.int32)
    member = np.ascontiguousarray(batch.member, np.uint8)
    end = np.empty(B, np.float64)

    def p32(a):
        return a.ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    def run(b):
        lib.qdp_align_score(
            p32(x_tok[b]), int(batch.x_len[b]),
            p32(y_tok[b]), p32(y_mk[b]), p32(y_ik[b]), p32(y_q[b]),
            int(batch.y_len[b]), int(batch.y_has_qual[b]),
            R,
            int(batch.d_lo[b]), W, member[b].ctypes.data_as(u8p),
            p64(tabs["match_score"]), p64(tabs["match_score_noq"]),
            p64(tabs["insert_score"]), p64(tabs["insert_score_noq"]),
            Km, Q,
            p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]),
            p64(tabs["m2e"]),
            float(tables.d2d), float(tables.d2m),
            float(tables.i2i), float(tables.i2m),
            0 if mode == "viterbi" else 1, int(bool(local)),
            end[b:].ctypes.data_as(f64p),
        )

    n_threads = min(B, threads if threads else (os.cpu_count() or 1))
    if n_threads <= 1:
        for b in range(B):
            run(b)
    else:
        with ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(run, range(B)))
    return end




def _align_tabs(tables):
    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        def c64(a):
            return np.ascontiguousarray(a, dtype=np.float64)

        tabs = {
            "match_score": c64(tables.match_score),
            "match_score_noq": c64(tables.match_score_noq),
            "insert_score": c64(tables.insert_score),
            "insert_score_noq": c64(tables.insert_score_noq),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "m2e": c64(tables.m2e),
        }
        tables._native_tabs = tabs
    return tabs


def align_path_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "qdp_align_viterbi_path")


def align_viterbi_path_cols(
    x_tok, x_len, y_tok, y_mk, y_ik_pad, y_q, y_len, y_has_qual,
    tables, local, d_lo, W, member,
):
    """Checkpointed fill + traceback in one native call (per pair and
    strip; no DP matrices ever materialise host-side).  Returns (col_x,
    col_y, x_start, x_end, score) with score bitwise equal to the full
    fill's end score, or None if the library is missing.  Raises on a
    broken traceback, matching the Python walk."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_align_viterbi_path"):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)

    tabs = _align_tabs(tables)
    Km = tabs["match_score"].shape[1]
    Q = tabs["match_score"].shape[2]

    def p32(a):
        return np.ascontiguousarray(a, np.int32).ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    member = np.ascontiguousarray(member, np.uint8)
    cap = int(x_len) + int(y_len)
    col_x = np.empty(cap, np.int32)
    col_y = np.empty(cap, np.int32)
    bounds = np.zeros(4, np.int64)
    score = np.zeros(1, np.float64)
    zq = np.zeros(max(int(y_len), 1), np.int32)
    n = lib.qdp_align_viterbi_path(
        p32(x_tok), int(x_len),
        p32(y_tok), p32(y_mk), p32(y_ik_pad),
        p32(y_q if y_q is not None else zq), int(y_len), int(y_has_qual),
        int(d_lo), int(W),
        member.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        p64(tabs["match_score"]), p64(tabs["match_score_noq"]),
        p64(tabs["insert_score"]), p64(tabs["insert_score_noq"]),
        Km, Q,
        p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]),
        p64(tabs["m2e"]),
        float(tables.d2d), float(tables.d2m),
        float(tables.i2i), float(tables.i2m),
        int(bool(local)),
        score.ctypes.data_as(f64p),
        col_x.ctypes.data_as(i32p), col_y.ctypes.data_as(i32p),
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n < 0:
        raise RuntimeError("Traceback error: no finite source")
    return (
        col_x[cap - n :], col_y[cap - n :],
        int(bounds[0]), int(bounds[1]), float(score[0]),
    )


def viterbi_traceback_cols(
    x_tok, x_len, y_tok, y_mk, y_ik_pad, y_q, y_len, y_has_qual,
    tables, local, d_lo, mat, ins, dele,
):
    """Native read-vs-ref traceback path.  Returns (col_x, col_y,
    x_start, x_end) with -1 = gap, or None if the library is missing.
    Raises on a broken traceback (no finite source), matching the
    Python walk."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_viterbi_traceback"):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)

    def c64(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        tabs = {
            "match_score": c64(tables.match_score),
            "match_score_noq": c64(tables.match_score_noq),
            "insert_score": c64(tables.insert_score),
            "insert_score_noq": c64(tables.insert_score_noq),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "m2e": c64(tables.m2e),
        }
        tables._native_tabs = tabs
    Km = tabs["match_score"].shape[1]
    Q = tabs["match_score"].shape[2]

    def p32(a):
        return np.ascontiguousarray(a, np.int32).ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    mat = c64(mat)
    ins = c64(ins)
    dele = c64(dele)
    n_rows, W = mat.shape[0] - 1, mat.shape[1]
    cap = int(x_len) + int(y_len)
    col_x = np.empty(cap, np.int32)
    col_y = np.empty(cap, np.int32)
    bounds = np.zeros(4, np.int64)
    zq = np.zeros(max(int(y_len), 1), np.int32)
    n = lib.qdp_viterbi_traceback(
        p32(x_tok), int(x_len),
        p32(y_tok), p32(y_mk), p32(y_ik_pad),
        p32(y_q if y_q is not None else zq), int(y_len), int(y_has_qual),
        n_rows, int(d_lo), W,
        p64(tabs["match_score"]), p64(tabs["match_score_noq"]),
        p64(tabs["insert_score"]), p64(tabs["insert_score_noq"]),
        Km, Q,
        p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]),
        p64(tabs["m2e"]),
        float(tables.d2d), float(tables.d2m),
        float(tables.i2i), float(tables.i2m),
        int(bool(local)),
        p64(mat), p64(ins), p64(dele),
        col_x.ctypes.data_as(i32p), col_y.ctypes.data_as(i32p),
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n < 0:
        raise RuntimeError("Traceback error: no finite source")
    return (
        col_x[cap - n :], col_y[cap - n :],
        int(bounds[0]), int(bounds[1]),
    )


def overlap_traceback_cols(
    x_mk, x_ik_pad, x_q, x_len, x_has_qual,
    y_mk, y_ik_pad, y_q, y_len, y_has_qual,
    tables, row_off, d_lo, mat, ins, dele,
):
    """Native overlap traceback path.  Returns (col_x, col_y, x_start,
    x_end, y_start, y_end), or None if the library is missing."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qdp_overlap_traceback"):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)

    def c64(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    tabs = getattr(tables, "_native_tabs", None)
    if tabs is None:
        tabs = {
            "pair_qq": c64(tables.pair_qq),
            "pair_xq": c64(tables.pair_xq),
            "pair_yq": c64(tables.pair_yq),
            "pair_nn": c64(tables.pair_nn),
            "m2m": c64(tables.m2m),
            "m2i": c64(tables.m2i),
            "m2d": c64(tables.m2d),
            "trans": np.array(
                [tables.i2m_eff, tables.i2i_eff, tables.i2d_eff,
                 tables.d2m_eff, tables.d2i_eff, tables.d2d_eff],
                dtype=np.float64,
            ),
        }
        tables._native_tabs = tabs
    Km = tabs["pair_qq"].shape[0]
    Q = tabs["pair_qq"].shape[2]
    Ki = tabs["m2m"].shape[0]

    def p32(a):
        return np.ascontiguousarray(a, np.int32).ctypes.data_as(i32p)

    def p64(a):
        return a.ctypes.data_as(f64p)

    mat = c64(mat)
    ins = c64(ins)
    dele = c64(dele)
    n_rows, W = mat.shape[0] - 1, mat.shape[1]
    cap = int(x_len) + int(y_len)
    col_x = np.empty(cap, np.int32)
    col_y = np.empty(cap, np.int32)
    bounds = np.zeros(4, np.int64)
    zx = np.zeros(max(int(x_len), 1), np.int32)
    zy = np.zeros(max(int(y_len), 1), np.int32)
    n = lib.qdp_overlap_traceback(
        p32(x_mk), p32(x_ik_pad),
        p32(x_q if x_q is not None else zx), int(x_len), int(x_has_qual),
        p32(y_mk), p32(y_ik_pad),
        p32(y_q if y_q is not None else zy), int(y_len), int(y_has_qual),
        int(row_off), n_rows, int(d_lo), W,
        p64(tabs["pair_qq"]), p64(tabs["pair_xq"]),
        p64(tabs["pair_yq"]), p64(tabs["pair_nn"]), Km, Q,
        p64(tabs["m2m"]), p64(tabs["m2i"]), p64(tabs["m2d"]), Ki,
        p64(tabs["trans"]),
        p64(mat), p64(ins), p64(dele),
        col_x.ctypes.data_as(i32p), col_y.ctypes.data_as(i32p),
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n < 0:
        raise RuntimeError("Overlap traceback error: no finite source")
    return (
        col_x[cap - n :], col_y[cap - n :],
        int(bounds[0]), int(bounds[1]), int(bounds[2]), int(bounds[3]),
    )


def diag_kmer_index_native(y_tok: np.ndarray, k: int):
    """Reusable counting-bucket k-mer index of y (k <= 12): returns
    (bucket_count [4^k+1] int32, y_pos [ny] int32) for
    diag_kmer_counts_native's y_index= fast path, or None.  All-vs-all
    prep joins every x against the same y — building this once per
    read repays the per-pair index build ~N times."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qio_diag_kmer_index") or k > 12:
        return None
    y = np.ascontiguousarray(y_tok, dtype=np.int32)
    ny = max(len(y) - k + 1, 0)
    bucket_count = np.empty((1 << (2 * k)) + 1, np.int32)
    y_pos = np.empty(max(ny, 1), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.qio_diag_kmer_index(
        y.ctypes.data_as(i32p), len(y), k,
        bucket_count.ctypes.data_as(i32p), y_pos.ctypes.data_as(i32p),
    )
    return bucket_count, y_pos


def diag_kmer_counts_indexed_native(
    x_tok: np.ndarray, y_len: int, k: int, index
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Join x against a prebuilt diag_kmer_index_native index."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "qio_diag_kmer_counts_indexed"):
        return None
    bucket_count, y_pos = index
    x = np.ascontiguousarray(x_tok, dtype=np.int32)
    cap = len(x) + int(y_len) + 2
    diags = np.empty(cap, dtype=np.int64)
    counts = np.empty(cap, dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n = lib.qio_diag_kmer_counts_indexed(
        x.ctypes.data_as(i32p), len(x), int(y_len), k,
        bucket_count.ctypes.data_as(i32p), y_pos.ctypes.data_as(i32p),
        diags.ctypes.data_as(i64p), counts.ctypes.data_as(i64p),
    )
    return diags[:n].copy(), counts[:n].copy()


def diag_kmer_counts_native(
    x_tok: np.ndarray, y_tok: np.ndarray, k: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x_tok, dtype=np.int32)
    y = np.ascontiguousarray(y_tok, dtype=np.int32)
    cap = len(x) + len(y) + 2
    diags = np.empty(cap, dtype=np.int64)
    counts = np.empty(cap, dtype=np.int64)
    n = lib.qio_diag_kmer_counts(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(x),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(y),
        k,
        diags.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return diags[:n].copy(), counts[:n].copy()
