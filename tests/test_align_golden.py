"""End-to-end alignment golden tests.

The flagship parity check, mirroring the reference's integration test
(Makefile:149-150):
  quaff align data/c8f30.fastq.gz data/c8f30.fastq.gz -kmatchmb 10 -fwdstrand
must produce data/c8f30-self-align.json (Stockholm text, score 7981.84)
byte for byte, including the auto-fitted null model.
"""

import io

import pytest

from quaff_tpu.aligner import DPConfig, QuaffAligner
from quaff_tpu.formats import AlignmentPrinter, OutputFormat
from quaff_tpu.io import read_fast_seqs
from quaff_tpu.model import QuaffNullParams, default_params


@pytest.fixture(scope="module")
def c8f30_env():
    import pathlib

    data = pathlib.Path(__file__).parent / "data"
    reads = read_fast_seqs(str(data / "c8f30.fastq.gz"))
    refs = read_fast_seqs(str(data / "c8f30.fastq.gz"))
    for r in refs:
        r.qual = ""  # refs are loaded without quality scores
    null = QuaffNullParams.fit(reads)
    return data, refs, reads, null


def test_null_model_fit_matches_reference_golden(c8f30_env):
    """The committed testquaffnullparams.json holds the reference's fitted
    NB parameters for the c8f30 read (with hand-rounded symbol probs); our
    GSL-equivalent fitter must reproduce every printed q/r digit, including
    the Newton-runaway case (r=321.069 for C)."""
    import json

    data, refs, reads, null = c8f30_env
    golden = json.loads((data / "testquaffnullparams.json").read_text())
    from quaff_tpu.model.params import fmt

    assert fmt(null.null_emit) == fmt(golden["nullEmit"])
    for i, c in enumerate("ACGT"):
        assert fmt(null.q[i]) == fmt(golden["null"][c]["q"])
        assert fmt(null.r[i]) == fmt(golden["null"][c]["r"])


def test_c8f30_self_align_golden(c8f30_env):
    data, refs, reads, null = c8f30_env
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    aligner = QuaffAligner(default_params(), null, cfg)
    out = io.StringIO()
    aligner.align_all(out, refs, reads, AlignmentPrinter(format=OutputFormat.STOCKHOLM))
    assert out.getvalue() == (data / "c8f30-self-align.json").read_text()


def test_c8f30_self_align_sam(c8f30_env):
    data, refs, reads, null = c8f30_env
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    aligner = QuaffAligner(default_params(), null, cfg)
    out = io.StringIO()
    aligner.align_all(out, refs, reads, AlignmentPrinter(format=OutputFormat.SAM))
    text = out.getvalue()
    lines = text.splitlines()
    assert lines[0].startswith("@HD\tVN:1.0\tGO:query")
    assert lines[1].startswith("@SQ\tSN:channel_8_read_24") and lines[1].endswith("LN:6604")
    body = lines[2].split("\t")
    assert body[1] == "0" and body[3] == "1"
    assert body[-1] == "AS:i:7982"


def test_tiny_align_smoke(data_dir):
    reads = read_fast_seqs(str(data_dir / "tiny.fastq"))
    refs = read_fast_seqs(str(data_dir / "tiny.fasta"))
    null = QuaffNullParams.fit(reads)
    cfg = DPConfig(kmer_threshold=20)
    aligner = QuaffAligner(default_params(), null, cfg)
    res = aligner.align_read(refs, reads[0])
    assert len(res) == 1
    a = res[0]
    assert a.gapped_seq[0].seq == "ACGT"
    assert a.gapped_seq[1].seq == "ACGT"
    assert a.gapped_seq[1].qual == "abcd"
