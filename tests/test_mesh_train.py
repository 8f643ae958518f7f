"""CLI `-mesh` training: the device-mesh E-step provider
(parallel/estep.MeshCountsProvider) must reproduce the sequential
trainer's fitted parameters — the mesh analogue of the reference's
loopback `-remote localhost` training test (Makefile:158-176), with the
pair grid sharded over 8 virtual CPU devices instead of farmed to a
socket worker.  Read-count padding to the dp axis is exercised (6 reads
on an 8-device dp axis -> 2 sentinel pad reads with zero posterior
weight).
"""

import contextlib
import io
import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from quaff_tpu.alphabet import DNA_ALPHABET  # noqa: E402
from quaff_tpu.cli import main  # noqa: E402


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def _assert_json_close(a, b, rtol, path=""):
    if isinstance(a, dict):
        assert isinstance(b, dict) and a.keys() == b.keys(), path
        for k in a:
            _assert_json_close(a[k], b[k], rtol, f"{path}/{k}")
    elif isinstance(a, list):
        assert isinstance(b, list) and len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_json_close(x, y, rtol, f"{path}[{i}]")
    elif isinstance(a, (int, float)) and not isinstance(a, bool):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-12, err_msg=path)
    else:
        assert a == b, path


def test_mesh_train_matches_sequential(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")

    rng = np.random.default_rng(57)
    ref_seq = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, 150))
    (tmp_path / "ref.fasta").write_text(f">genome\n{ref_seq}\n")
    lines = []
    for i in range(6):  # 6 reads on dp=8: exercises sentinel padding
        start = int(rng.integers(0, 30))
        toks = [
            int(rng.integers(0, 4)) if rng.random() < 0.05
            else DNA_ALPHABET.index(c)
            for c in ref_seq[start : start + 100]
        ]
        seq = "".join(DNA_ALPHABET[t] for t in toks)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(5, 30, len(seq)))
        lines.append(f"@read{i}\n{seq}\n+\n{qual}\n")
    (tmp_path / "reads.fastq").write_text("".join(lines))

    base = [
        "train",
        str(tmp_path / "ref.fasta"),
        str(tmp_path / "reads.fastq"),
        "-fwdstrand",
        "-force",
        "-maxiter", "2",
    ]
    rc_seq, out_seq = _run(base)
    assert rc_seq == 0
    rc_mesh, out_mesh = _run(base + ["-mesh"])
    assert rc_mesh == 0

    seq_params = json.loads(out_seq)
    mesh_params = json.loads(out_mesh)
    # all (read, ref) pairs are within the sequential path's Δ=20 window
    # here, so the two E-steps compute the same sums in f64 — only
    # reduction order differs
    _assert_json_close(seq_params, mesh_params, rtol=1e-6)


def test_meshmp_ref_axis(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")

    rng = np.random.default_rng(61)
    ref_seq = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, 140))
    (tmp_path / "ref.fasta").write_text(f">genome\n{ref_seq}\n")
    lines = []
    for i in range(4):
        toks = [
            int(rng.integers(0, 4)) if rng.random() < 0.05
            else DNA_ALPHABET.index(c)
            for c in ref_seq[10:110]
        ]
        seq = "".join(DNA_ALPHABET[t] for t in toks)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(5, 30, len(seq)))
        lines.append(f"@read{i}\n{seq}\n+\n{qual}\n")
    (tmp_path / "reads.fastq").write_text("".join(lines))

    # no -fwdstrand: refs = genome + its revcomp -> K=2 divides -meshmp 2
    base = [
        "train",
        str(tmp_path / "ref.fasta"),
        str(tmp_path / "reads.fastq"),
        "-force",
        "-maxiter", "2",
    ]
    rc_seq, out_seq = _run(base)
    assert rc_seq == 0
    rc_mesh, out_mesh = _run(base + ["-meshmp", "2"])
    assert rc_mesh == 0
    # the revcomp ref's posterior weight is ~e^-Δ with Δ >> 20: counted
    # exactly by the mesh path, skipped by the sequential Δ=20 heuristic
    # — numerically identical at f64
    _assert_json_close(json.loads(out_seq), json.loads(out_mesh), rtol=1e-6)


def test_meshmp_rejects_nondivisible_refs(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    rng = np.random.default_rng(3)
    ref_seq = "".join(DNA_ALPHABET[t] for t in rng.integers(0, 4, 100))
    (tmp_path / "ref.fasta").write_text(f">g\n{ref_seq}\n")
    (tmp_path / "reads.fastq").write_text(
        f"@r0\n{ref_seq[:60]}\n+\n{'I' * 60}\n"
    )
    rc, _ = _run(
        [
            "train",
            str(tmp_path / "ref.fasta"),
            str(tmp_path / "reads.fastq"),
            "-fwdstrand",  # 1 ref does not divide mp=2
            "-force",
            "-maxiter", "1",
            "-meshmp", "2",
        ]
    )
    assert rc == 1  # clear error, not a crash
