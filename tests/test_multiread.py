"""Multi-read batched alignment parity.

Three reads (the c8f30 original plus noisy substrings) against three
reference variants exercise the cross-read bucketed batch scoring path
(distinct read-length buckets) — output must be byte-identical to the
reference binary's.
"""

import contextlib
import io

from quaff_tpu.cli import main


def _run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def test_multiread_batched_align(data_dir):
    rc, out = _run(
        [
            "align",
            str(data_dir / "multiref.fasta"),
            str(data_dir / "multireads.fastq"),
            "-kmatchmb",
            "10",
            "-fwdstrand",
        ]
    )
    assert rc == 0
    assert out == (data_dir / "multireads-align.oracle.txt").read_text()


def test_batched_matches_sequential(data_dir):
    """The bucketed batch path and the per-read path must agree exactly."""
    from quaff_tpu.aligner import DPConfig, QuaffAligner
    from quaff_tpu.formats import AlignmentPrinter
    from quaff_tpu.io import read_fast_seqs
    from quaff_tpu.model import QuaffNullParams, default_params

    reads = read_fast_seqs(str(data_dir / "multireads.fastq"))
    refs = read_fast_seqs(str(data_dir / "multiref.fasta"))
    for r in refs:
        r.qual = ""
    null = QuaffNullParams.fit(reads)
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    aligner = QuaffAligner(default_params(), null, cfg)
    printer = AlignmentPrinter()

    batched = io.StringIO()
    aligner.align_all(batched, refs, reads, printer)

    sequential = io.StringIO()
    printer.write_header(sequential, refs, group_by_query=True)
    for y in reads:
        for a in aligner.align_read(refs, y):
            printer.write_alignment(sequential, a)

    assert batched.getvalue() == sequential.getvalue()
