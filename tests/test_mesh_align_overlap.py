"""CLI `-mesh` align/overlap: sharded batch scoring over the device mesh
must leave the output byte-identical to the sequential pipelines (the
mesh analogue of the reference's parallelized align/overlap,
qmodel.cpp:2624-2646 / qoverlap.cpp:312-334 — every workload is
parallelized, not just training)."""

import contextlib
import io
import pathlib

import pytest

jax = pytest.importorskip("jax")

from quaff_tpu.cli import main  # noqa: E402

DATA = pathlib.Path(__file__).parent / "data"


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


@pytest.fixture(autouse=True)
def _need_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")


def test_mesh_align_matches_sequential():
    base = [
        "align", str(DATA / "synth12-genome.fasta"),
        str(DATA / "synth12.fastq"), "-kmatchn", "10", "-nothreshold",
    ]
    rc, seq = _run(base)
    assert rc == 0
    rc, mesh = _run(base + ["-mesh"])
    assert rc == 0
    assert mesh == seq
    # and both match the reference oracle
    assert seq == (DATA / "synth12-align.oracle.stk").read_text()


def test_mesh_align_printall_sam():
    base = [
        "align", str(DATA / "multiref.fasta"),
        str(DATA / "multireads.fastq"), "-kmatchn", "1", "-nothreshold",
        "-printall", "-format", "sam",
    ]
    rc, seq = _run(base)
    assert rc == 0
    rc, mesh = _run(base + ["-mesh"])
    assert rc == 0
    assert mesh == seq


def test_mesh_overlap_matches_sequential():
    base = [
        "overlap", str(DATA / "synth12.fastq"),
        "-kmatchn", "10", "-nothreshold",
    ]
    rc, seq = _run(base)
    assert rc == 0
    rc, mesh = _run(base + ["-mesh"])
    assert rc == 0
    assert mesh == seq
    # the oracle was generated with these exact flags (see
    # test_oracle_goldens.test_overlap_synth12_all_vs_all)
    assert seq == (DATA / "synth12-overlap.oracle.stk").read_text()


def test_mesh_overlap_with_threshold():
    # the kernel-score pruning path (threshold > -inf) under the mesh
    base = ["overlap", str(DATA / "synth12.fastq"), "-kmatchn", "10"]
    rc, seq = _run(base)
    assert rc == 0
    rc, mesh = _run(base + ["-mesh"])
    assert rc == 0
    assert mesh == seq
