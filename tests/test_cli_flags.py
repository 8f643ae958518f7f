"""Flag-coverage CLI tests for options no other test exercises:
banding (-kmatch/-kmatchn/-kmatchband), output thresholding
(-threshold), null-model artifacts (-savenull/-null), training control
(-mininc/-maxreadmb/-suborder/-gaporder/-savecountswithprior,
-checkpoint), and -version.  Mirrors the reference's flag semantics
(t/quaff.cpp:638-774)."""

import pytest

from quaff_tpu.cli import main

from test_cli import _run  # noqa: F401  (shared in-process runner)


def test_threshold_filters_output(data_dir):
    # tiny self-alignment scores -164.513: passes -200, filtered at -100
    base = [
        "align",
        str(data_dir / "tiny.fasta"),
        str(data_dir / "tiny.fastq"),
    ]
    rc, out = _run(base + ["-threshold", "-200"])
    assert rc == 0 and "#=GF Score -164.513" in out
    rc, out = _run(base + ["-threshold", "-100"])
    assert rc == 0 and out == ""


def test_savenull_and_null_roundtrip(data_dir, tmp_path):
    null_file = tmp_path / "null.json"
    base = [
        "align",
        str(data_dir / "tiny.fasta"),
        str(data_dir / "tiny.fastq"),
        "-nothreshold",
    ]
    rc, out1 = _run(base + ["-savenull", str(null_file)])
    assert rc == 0 and null_file.exists()
    from quaff_tpu.model.params import QuaffNullParams

    null = QuaffNullParams.from_json(null_file.read_text())
    assert 0 < null.null_emit < 1
    # reloading the saved null model reproduces the same output
    rc, out2 = _run(base + ["-null", str(null_file)])
    assert rc == 0 and out2 == out1


def test_custom_banding_flags(data_dir):
    rc, out = _run(
        [
            "align",
            str(data_dir / "c8f30.fastq.gz"),
            str(data_dir / "c8f30.fastq.gz"),
            "-fwdstrand",
            "-kmatch", "5",
            "-kmatchn", "25",
            "-kmatchband", "32",
        ]
    )
    assert rc == 0
    assert "# STOCKHOLM" in out and "#=GF Score" in out


def test_kmatch_range_check(data_dir):
    with pytest.raises(SystemExit):
        _run(
            [
                "align",
                str(data_dir / "tiny.fasta"),
                str(data_dir / "tiny.fastq"),
                "-kmatch", "4",
            ]
        )


def test_train_orders_and_artifacts(data_dir, tmp_path):
    cwp = tmp_path / "cwp.json"
    params_file = tmp_path / "params.json"
    rc, _ = _run(
        [
            "train",
            str(data_dir / "tiny.fasta"),
            str(data_dir / "tiny.fastq"),
            "-maxiter", "1",
            "-force",
            "-suborder", "1",
            "-gaporder", "1",
            "-savecountswithprior", str(cwp),
            "-saveparams", str(params_file),
        ]
    )
    assert rc == 0
    from quaff_tpu.model.params import QuaffParamCounts, QuaffParams

    qp = QuaffParams.from_json(params_file.read_text())
    assert qp.match_kmer_len == 2  # -suborder 1 -> match order 2
    assert qp.indel_kmer_len == 1  # -gaporder 1
    counts = QuaffParamCounts.from_json(cwp.read_text())
    assert counts.match_kmer_len == 2
    # prior pseudocounts are folded in, so every count is positive
    import numpy as np

    assert np.all(np.asarray(counts.match) >= 0)
    assert float(np.sum(np.asarray(counts.match))) > 0


def test_mininc_early_convergence(data_dir, tmp_path):
    # a huge fractional-increase threshold stops EM after iteration 2
    params_file = tmp_path / "params.json"
    rc, _ = _run(
        [
            "train",
            str(data_dir / "tiny.fasta"),
            str(data_dir / "tiny.fastq"),
            "-maxiter", "50",
            "-mininc", "10",
            "-force",
            "-saveparams", str(params_file),
        ]
    )
    assert rc == 0 and params_file.exists()


def test_maxreadmb_truncates_training_set(data_dir, tmp_path):
    reads = tmp_path / "reads.fastq"
    reads.write_text(
        "@r1\nACGT\n+\nabcd\n@r2\nACGTACGTACGTACGT\n+\nabcdabcdabcdabcd\n"
    )
    params_file = tmp_path / "params.json"
    rc, _ = _run(
        [
            "train",
            str(data_dir / "tiny.fasta"),
            str(reads),
            # 4e-6 MB = 4 bases: only r1 fits (qmodel.cpp:2169-2183)
            "-maxreadmb", "0.000004",
            "-maxiter", "1",
            "-force",
            "-saveparams", str(params_file),
        ]
    )
    assert rc == 0 and params_file.exists()


def test_checkpoint_flag_writes_state(data_dir, tmp_path):
    ckpt = tmp_path / "ckpt"
    rc, _ = _run(
        [
            "train",
            str(data_dir / "tiny.fasta"),
            str(data_dir / "tiny.fastq"),
            "-maxiter", "2",
            "-force",
            "-checkpoint", str(ckpt),
        ]
    )
    assert rc == 0
    assert (ckpt / "state.json").exists()
    assert (ckpt / "params.json").exists()


def test_version_flag():
    assert main(["-version"]) == 0
