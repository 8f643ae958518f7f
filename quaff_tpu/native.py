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
    if _LIB_TRIED and not auto_build:
        return None
    _LIB_TRIED = True
    path = _lib_path()
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
