"""Counts-as-prior round trip: -savecounts output must load back as a
-prior and seed training (the reference's counts-are-pseudocounts design,
t/quaff.cpp:431-515)."""

import contextlib
import io
import json

from quaff_tpu.cli import main


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def test_savecounts_then_prior(data_dir, tmp_path):
    counts_file = tmp_path / "counts.json"
    rc, _ = _run(
        [
            "count",
            str(data_dir / "multiref.fasta"),
            str(data_dir / "multireads.fastq"),
            "-kmatchmb",
            "10",
            "-fwdstrand",
            "-savecounts",
            str(counts_file),
        ]
    )
    assert rc == 0
    data = json.loads(counts_file.read_text())
    assert float(data["beginInsertNo"][""]) > 1000  # match mass present

    # use the counts as a training prior
    params_file = tmp_path / "params.json"
    rc, _ = _run(
        [
            "train",
            str(data_dir / "multiref.fasta"),
            str(data_dir / "multireads.fastq"),
            "-kmatchmb",
            "10",
            "-fwdstrand",
            "-maxiter",
            "1",
            "-prior",
            str(counts_file),
            "-params",
            "quaff_tpu/model/defaultparams.json",
            "-saveparams",
            str(params_file),
        ]
    )
    assert rc == 0
    # substitution-only training data leaves some count rows empty, so a
    # few fitted entries are nan (the reference's unguarded fits do the
    # same); the round trip itself must complete and produce the artifact
    text = params_file.read_text()
    assert '"match"' in text and '"extendInsert"' in text


def test_saveprior_matches_initcounts(data_dir, tmp_path):
    """-saveprior writes the auto-built initCounts(9,9,5,1,null) prior."""
    prior_file = tmp_path / "prior.json"
    rc, _ = _run(
        [
            "train",
            str(data_dir / "tiny.fasta"),
            str(data_dir / "tiny.fastq"),
            "-maxiter",
            "1",
            "-saveprior",
            str(prior_file),
            "-saveparams",
            str(tmp_path / "p.json"),
        ]
    )
    assert rc == 0
    data = json.loads(prior_file.read_text())
    assert float(data["beginInsertNo"][""]) == 9.0
    assert float(data["extendInsertYes"]) == 9.0
    assert float(data["extendInsertNo"]) == 1.0
