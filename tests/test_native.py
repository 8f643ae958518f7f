"""Native host-runtime library (libquaffio.so) equivalence tests.

The C++ parser/tokeniser/envelope-seeder must agree exactly with the pure
Python implementations on the repository data.  Skipped when the library
has not been built (make -C native).
"""

import numpy as np
import pytest

from quaff_tpu import native


pytestmark = pytest.mark.skipif(
    not (native.available() or native.build_native()),
    reason="native library not built and no toolchain",
)


def test_native_parse_matches_python(data_dir, monkeypatch):
    from quaff_tpu.io import fastseq as fsmod

    for fname in [
        "c8f30.fastq.gz",
        "tiny.fasta",
        "tiny.fastq",
        "tiny.noqual.fastq",
        "tiny.truncated.fastq",
    ]:
        path = str(data_dir / fname)
        nat = native.read_fast_seqs_native(path)
        monkeypatch.setenv("QUAFF_TPU_NATIVE", "0")
        py = fsmod.read_fast_seqs(path)
        monkeypatch.setenv("QUAFF_TPU_NATIVE", "1")
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            assert a.name == b.name
            assert a.comment == b.comment
            assert a.seq == b.seq
            assert a.qual == b.qual
            assert a.filepos == b.filepos


def test_native_tokenize(data_dir):
    from quaff_tpu.io import read_fast_seqs

    seq = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    np.testing.assert_array_equal(native.tokenize_native(seq.seq), seq.tokens())
    with pytest.raises(ValueError):
        native.tokenize_native("ACGN")


def test_native_diag_counts(data_dir):
    from quaff_tpu.envelope import diagonal_kmer_counts
    from quaff_tpu.io import KmerIndex, read_fast_seqs

    seq = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    tok = seq.tokens()
    d, c = native.diag_kmer_counts_native(tok, tok, 6)
    d2, c2 = diagonal_kmer_counts(tok, KmerIndex(seq, 6), len(seq.seq), len(seq.seq))
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(c, c2)
