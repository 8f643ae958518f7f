"""CLI end-to-end tests against the golden files (the reference's
quaff-tests, Makefile:146-156), exercising the full command surface
in-process."""

import contextlib
import io

import pytest

from quaff_tpu.cli import main


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def test_cli_align_golden(data_dir):
    rc, out = _run(
        [
            "align",
            str(data_dir / "c8f30.fastq.gz"),
            str(data_dir / "c8f30.fastq.gz"),
            "-kmatchmb",
            "10",
            "-fwdstrand",
        ]
    )
    assert rc == 0
    assert out == (data_dir / "c8f30-self-align.json").read_text()


def test_cli_count_golden(data_dir):
    rc, out = _run(
        [
            "count",
            str(data_dir / "c8f30.fastq.gz"),
            str(data_dir / "c8f30.fastq.gz"),
            "-kmatchmb",
            "10",
            "-fwdstrand",
        ]
    )
    assert rc == 0
    assert out == (data_dir / "c8f30-self-counts.json").read_text().rstrip("\n")


def test_cli_overlap_golden(data_dir):
    copy = data_dir / "copy-of-c8f30.fastq"
    if not copy.exists():
        import gzip

        text = gzip.open(data_dir / "c8f30.fastq.gz", "rt").read()
        copy.write_text(text.replace("channel", "copy"))
    rc, out = _run(
        [
            "overlap",
            str(data_dir / "c8f30.fastq.gz"),
            str(copy),
            "-kmatchmb",
            "10",
            "-fwdstrand",
        ]
    )
    assert rc == 0
    assert out == (data_dir / "c8f30-self-overlap.json").read_text()


def test_cli_align_sam_format(data_dir):
    rc, out = _run(
        [
            "align",
            str(data_dir / "tiny.fasta"),
            str(data_dir / "tiny.fastq"),
            "-format",
            "sam",
            "-nothreshold",
        ]
    )
    assert rc == 0
    lines = out.splitlines()
    assert lines[0].startswith("@HD")
    assert lines[1] == "@SQ\tSN:tiny\tLN:4"
    assert lines[2].split("\t")[0] == "tiny"


def test_cli_help_and_version(capsys):
    assert main(["help"]) == 0
    assert main(["--version"]) == 0


def test_cli_train_tiny(data_dir, tmp_path):
    """Train smoke test: two EM iterations on the tiny data must produce a
    valid params JSON that round-trips."""
    params_file = tmp_path / "params.json"
    rc, out = _run(
        [
            "train",
            str(data_dir / "tiny.fasta"),
            str(data_dir / "tiny.fastq"),
            "-maxiter",
            "2",
            "-force",
            "-saveparams",
            str(params_file),
        ]
    )
    assert rc == 0
    from quaff_tpu.model.params import QuaffParams

    qp = QuaffParams.from_json(params_file.read_text())
    assert 0 < qp.extend_insert < 1
    assert 0 < qp.extend_delete < 1
    import numpy as np

    assert np.all(qp.match_prob > 0)
    # ref base composition fitted from tiny.fasta (ACGT -> uniform)
    np.testing.assert_allclose(qp.ref_base, 0.25)


def test_cli_savealign(data_dir, tmp_path):
    out_file = tmp_path / "hits.stk"
    rc, out = _run(
        [
            "align",
            str(data_dir / "c8f30.fastq.gz"),
            str(data_dir / "c8f30.fastq.gz"),
            "-kmatchmb",
            "10",
            "-fwdstrand",
            "-savealign",
            str(out_file),
        ]
    )
    assert rc == 0
    assert out == ""
    assert out_file.read_text() == (data_dir / "c8f30-self-align.json").read_text()


def test_cli_duplicate_names_rejected(data_dir, tmp_path):
    dup = tmp_path / "dup.fasta"
    dup.write_text(">a\nACGTACGT\n>a\nACGTACGT\n")
    with pytest.raises(SystemExit):
        _run(
            [
                "align",
                str(dup),
                str(data_dir / "tiny.fastq"),
            ]
        )


def test_cli_profile_trace(data_dir, tmp_path):
    trace_dir = tmp_path / "trace"
    rc, out = _run(
        [
            "align",
            str(data_dir / "tiny.fasta"),
            str(data_dir / "tiny.fastq"),
            "-nothreshold",
            "-profile",
            str(trace_dir),
        ]
    )
    assert rc == 0
    assert "# STOCKHOLM" in out
    import os

    assert any(trace_dir.rglob("*")), "profiler trace directory is empty"


def test_cli_unknown_symbol_exits_nonzero(data_dir, tmp_path):
    bad = tmp_path / "bad.fastq"
    bad.write_text("@r\nACGN\n+\naaaa\n")
    rc, _ = _run(["align", str(data_dir / "tiny.fasta"), str(bad)])
    assert rc == 1


def test_cli_abort_flag(data_dir, capsys):
    """-abort is the reference's hidden stack-trace test flag
    (optparser.cpp:35-37): it must fail loudly, not parse as a file."""
    rc = main(["align", str(data_dir / "tiny.fasta"), "-abort"])
    assert rc != 0
    assert "abort triggered" in capsys.readouterr().err
