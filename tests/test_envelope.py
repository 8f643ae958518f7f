"""Envelope invariants, mirroring the reference's testdiagenv run
(bin/testdiagenv data/c8f30.fastq.gz data/c8f30.fastq.gz 6 14 64) plus the
dense band view used by the DP kernels."""

import numpy as np
import pytest

from quaff_tpu.envelope import full_envelope, make_envelope, sparse_envelope
from quaff_tpu.io import KmerIndex, read_fast_seqs


@pytest.fixture(scope="module")
def c8f30(data_dir=None):
    import pathlib

    data = pathlib.Path(__file__).parent / "data"
    return read_fast_seqs(str(data / "c8f30.fastq.gz"))[0]


def _check_envelope(env):
    # member diagonals sorted unique, within range, containing 0
    d = env.diagonals
    assert np.all(np.diff(d) > 0)
    assert d[0] >= 1 - env.y_len and d[-1] <= env.x_len - 1
    assert env.contains(1, 1) or 0 in d.tolist()
    # forward_i equals brute-force membership for a sample of rows
    for j in [1, 2, env.y_len // 2, env.y_len - 1, env.y_len]:
        brute = np.array(
            [i for i in range(1, env.x_len + 1) if env.contains(i, j)],
            dtype=np.int64,
        )
        np.testing.assert_array_equal(env.forward_i(j), brute)
    # dense band view covers exactly the member diagonals
    mask = env.member_mask()
    dense_diags = np.nonzero(mask)[0] + env.band_lo
    np.testing.assert_array_equal(dense_diags, d)
    # halo lanes exist on both sides
    assert not mask[0] and not mask[-1]


def test_full_envelope():
    env = full_envelope(7, 5)
    _check_envelope(env)
    assert len(env.diagonals) == 7 + 5 - 1
    assert env.num_cells == 7 * 5


def test_sparse_envelope_self_match(c8f30):
    idx = KmerIndex(c8f30, 6)
    env = sparse_envelope(c8f30, idx, band_size=64, kmer_threshold=14)
    _check_envelope(env)
    # self-comparison: diagonal 0 has ~xLen matches, must be a member and
    # surrounded by the +/- halfband dilation
    assert env.contains(100, 100)
    assert 0 in env.diagonals.tolist()
    assert 32 in env.diagonals.tolist() and -32 in env.diagonals.tolist()


def test_short_sequences_fall_back_to_full():
    from quaff_tpu.io.fastseq import FastSeq

    x = FastSeq(name="x", seq="ACGTACGT")
    idx = KmerIndex(x, 6)
    env = sparse_envelope(x, idx, kmer_threshold=14)
    assert len(env.diagonals) == 2 * 8 - 1  # full


def test_memory_budget_mode(c8f30):
    idx = KmerIndex(c8f30, 6)
    # the align golden config: -kmatchmb 10 with Viterbi cell size 24
    env = make_envelope(
        c8f30, idx, kmer_threshold=-1, cell_size=24, max_size=10 << 20
    )
    _check_envelope(env)
    # storage must fit the budget
    diag_size = min(env.x_len, env.y_len) * 24
    assert len(env.storage_diagonals) * diag_size < (10 << 20) + 2 * diag_size
    assert env.contains(100, 100)


def test_storage_size_consistency(c8f30):
    idx = KmerIndex(c8f30, 6)
    env = sparse_envelope(c8f30, idx, band_size=64, kmer_threshold=14)
    sd = env.storage_diagonals
    # brute-force total storage
    total = 0
    for j in range(env.y_len + 1):
        total += int(np.sum((sd + j >= 0) & (sd + j <= env.x_len)))
    assert env.total_storage_size == total
    assert env.num_cells <= total
