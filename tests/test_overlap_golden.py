"""Overlap golden test, mirroring the reference integration test
(Makefile:153-156):
  quaff overlap data/c8f30.fastq.gz data/copy-of-c8f30.fastq -kmatchmb 10 -fwdstrand
must reproduce data/c8f30-self-overlap.json byte for byte (score 6876.76;
requires the reference's truncated log-sum-exp semantics in the pair
table build).
"""

import gzip
import io

import pytest

from quaff_tpu.aligner import DPConfig
from quaff_tpu.formats import AlignmentPrinter, OutputFormat
from quaff_tpu.io import read_fast_seqs
from quaff_tpu.model import QuaffNullParams, default_params
from quaff_tpu.overlap import QuaffOverlapAligner


@pytest.fixture(scope="module")
def copy_file(tmp_path_factory):
    import pathlib

    data = pathlib.Path(__file__).parent / "data"
    path = data / "copy-of-c8f30.fastq"
    if not path.exists():
        text = gzip.open(data / "c8f30.fastq.gz", "rt").read()
        path.write_text(text.replace("channel", "copy"))
    return path


def test_c8f30_self_overlap_golden(data_dir, copy_file):
    seqs = read_fast_seqs(str(data_dir / "c8f30.fastq.gz")) + read_fast_seqs(
        str(copy_file)
    )
    n_originals = 2  # -fwdstrand
    null = QuaffNullParams.fit(seqs)
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    aligner = QuaffOverlapAligner(default_params(), null, cfg)
    out = io.StringIO()
    aligner.align_all(
        out, seqs, n_originals, AlignmentPrinter(format=OutputFormat.STOCKHOLM)
    )
    assert out.getvalue() == (data_dir / "c8f30-self-overlap.json").read_text()


def test_overlap_pair_enumeration():
    from quaff_tpu.io.fastseq import FastSeq

    cfg = DPConfig()
    aligner = QuaffOverlapAligner.__new__(QuaffOverlapAligner)
    seqs = [FastSeq(name=str(i), seq="ACGT") for i in range(4)]
    # 2 originals + 2 revcomp copies: reference order stops at nx+1 >= 2
    pairs = list(aligner.enumerate_pairs(seqs, 2))
    assert pairs == [(0, 1, False), (0, 2, True), (0, 3, True)]
    # fwdstrand, 2 originals only
    pairs = list(aligner.enumerate_pairs(seqs[:2], 2))
    assert pairs == [(0, 1, False)]
