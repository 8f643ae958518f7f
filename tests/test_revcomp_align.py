"""Reverse-strand alignment parity (oracle goldens).

The reference is the reverse complement of the read, so the winning
alignment is against the auto-added revcomp copy — exercising revcomp
provenance composition (SeqIntervalCoords::compose), the Stockholm
substr(revcomp(...)) comments, and SAM flag-16 normalisation (the
alignment is re-revcomped so the reference coordinates are forward,
qmodel.cpp:608-616).
"""

import contextlib
import io

from quaff_tpu.cli import main


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def test_revcomp_ref_stockholm(data_dir):
    rc, out = _run(
        [
            "align",
            str(data_dir / "revref.fasta"),
            str(data_dir / "c8f30.fastq.gz"),
            "-kmatchmb",
            "10",
        ]
    )
    assert rc == 0
    assert out == (data_dir / "revref-align.oracle.txt").read_text()


def test_revcomp_ref_sam(data_dir):
    rc, out = _run(
        [
            "align",
            str(data_dir / "revref.fasta"),
            str(data_dir / "c8f30.fastq.gz"),
            "-kmatchmb",
            "10",
            "-format",
            "sam",
        ]
    )
    assert rc == 0
    assert out == (data_dir / "revref-sam.oracle.txt").read_text()
