"""Multi-reference parity tests (oracle-generated goldens).

Three full-length variants of the c8f30 read (exact / 5% / 15% noise)
exercise best-ref selection, -printall score-ordered output, posterior
count weighting across competing refs, and the Δ=20 ref-pruning logic in
training (var1/var2 are dropped from the sort order after iteration 1).
"""

import contextlib
import io
import json

from quaff_tpu.cli import main


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def _args(data_dir, cmd, *extra):
    return [
        cmd,
        str(data_dir / "multiref.fasta"),
        str(data_dir / "c8f30.fastq.gz"),
        "-kmatchmb",
        "10",
        "-fwdstrand",
        *extra,
    ]


def test_multiref_best_alignment(data_dir):
    rc, out = _run(_args(data_dir, "align"))
    assert rc == 0
    assert out == (data_dir / "multiref-align.oracle.txt").read_text()


def test_multiref_printall_sorted(data_dir):
    rc, out = _run(_args(data_dir, "align", "-printall"))
    assert rc == 0
    assert out == (data_dir / "multiref-printall.oracle.txt").read_text()
    scores = [
        float(line.split()[-1])
        for line in out.splitlines()
        if line.startswith("#=GF Score")
    ]
    assert scores == sorted(scores, reverse=True) and len(scores) == 3


def test_multiref_counts(data_dir):
    rc, out = _run(_args(data_dir, "count"))
    assert rc == 0
    golden = (data_dir / "multiref-count.oracle.json").read_text().rstrip("\n")
    assert out == golden


def test_multiref_train_with_pruning(data_dir, tmp_path):
    params_file = tmp_path / "params.json"
    rc, _ = _run(
        _args(
            data_dir,
            "train",
            "-maxiter",
            "2",
            "-saveparams",
            str(params_file),
        )
    )
    assert rc == 0
    mine = json.loads(params_file.read_text())
    want = json.loads((data_dir / "multiref-train2.oracle.json").read_text())

    mismatches = []

    def cmp(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                cmp(a[k], b.get(k), path + "/" + k)
        elif isinstance(a, (int, float)):
            if path.startswith("/refBase"):
                return  # reference UB (uninitialised totalLen)
            if abs(float(a) - float(b)) > 1e-4 + 2e-3 * abs(float(b)):
                mismatches.append((path, a, b))

    cmp(mine, want)
    assert mismatches == []
