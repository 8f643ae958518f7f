"""Distributed loopback tests — the analogue of the reference's
-remote localhost tests (Makefile:158-170): a real worker server on a
localhost port, every task delegated over TCP with the reference's
"# EOF"-framed JSON protocol, and the merged output must be byte-identical
to the single-process golden files.
"""

import io
import json
import socket
import threading
import time

import pytest

from quaff_tpu.aligner import DPConfig
from quaff_tpu.formats import AlignmentPrinter, OutputFormat
from quaff_tpu.io import read_fast_seqs
from quaff_tpu.model import QuaffNullParams, default_params
from quaff_tpu.server import (
    QuaffServer,
    RemoteWorker,
    remote_align_all,
    remote_get_counts,
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def c8f30_setup():
    import pathlib

    data = pathlib.Path(__file__).parent / "data"
    reads = read_fast_seqs(str(data / "c8f30.fastq.gz"))
    refs = read_fast_seqs(str(data / "c8f30.fastq.gz"))
    for r in refs:
        r.qual = ""
    null = QuaffNullParams.fit(reads)
    params = default_params()
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    return data, refs, reads, params, null, cfg


def _start_server(server: QuaffServer, port: int):
    t = threading.Thread(target=server.serve, args=(port, 1))
    t.daemon = True
    t.start()
    # wait for the port to accept connections
    for _ in range(100):
        try:
            socket.create_connection(("localhost", port), timeout=0.2).close()
            return t
        except OSError:
            time.sleep(0.05)
    raise RuntimeError("server did not start")


def test_align_loopback_matches_golden(c8f30_setup):
    data, refs, reads, params, null, cfg = c8f30_setup
    port = _free_port()
    printer = AlignmentPrinter(format=OutputFormat.STOCKHOLM)
    server = QuaffServer(
        "align", cfg, refs, reads, len(reads),
        printer=printer, params=params, null_model=null,
    )
    t = _start_server(server, port)
    worker = RemoteWorker("localhost", port)
    out = io.StringIO()
    remote_align_all(out, [worker], reads, refs, printer)
    worker.quit()
    t.join(timeout=5)
    assert out.getvalue() == (data / "c8f30-self-align.json").read_text()


def test_count_loopback_matches_golden(c8f30_setup):
    data, refs, reads, params, null, cfg = c8f30_setup
    port = _free_port()
    server = QuaffServer("count", cfg, refs, reads, len(reads))
    t = _start_server(server, port)
    worker = RemoteWorker("localhost", port)
    counts, loglike, orders = remote_get_counts(
        [worker], refs, reads, params, null
    )
    worker.quit()
    t.join(timeout=5)
    assert orders == [[0]]
    out = io.StringIO()
    counts.write_json(out)
    golden = (data / "c8f30-self-counts.json").read_text().rstrip("\n")
    # counts travelled through 6-sig-fig JSON, so compare at that precision
    got = json.loads(out.getvalue())
    want = json.loads(golden)

    def close(a, b):
        if isinstance(a, dict):
            return all(close(a[k], b[k]) for k in a)
        if isinstance(a, list):
            return all(close(x, y) for x, y in zip(a, b))
        return abs(float(a) - float(b)) <= 1e-6 + 1e-5 * abs(float(b))

    assert close(got, want)


def test_job_file_single_shot(c8f30_setup, tmp_path):
    """The qsub/-job path (qmodel.cpp:2043-2050): run one task from a job
    file, result on stdout."""
    data, refs, reads, params, null, cfg = c8f30_setup
    printer = AlignmentPrinter(format=OutputFormat.STOCKHOLM)
    server = QuaffServer(
        "align", cfg, refs, reads, len(reads),
        printer=printer, params=params, null_model=null,
    )
    job = tmp_path / "info.json"
    job.write_text(json.dumps({"yName": reads[0].name}))
    out = io.StringIO()
    server.run_job_file(str(job), out)
    assert out.getvalue() == (data / "c8f30-self-align.json").read_text()


def test_overlap_loopback_matches_golden(c8f30_setup):
    """Overlap worker protocol: {"xName","yName","yComplemented"} jobs."""
    import pathlib

    data = pathlib.Path(__file__).parent / "data"
    copy = data / "copy-of-c8f30.fastq"
    if not copy.exists():
        import gzip

        text = gzip.open(data / "c8f30.fastq.gz", "rt").read()
        copy.write_text(text.replace("channel", "copy"))
    from quaff_tpu.io import read_fast_seqs
    from quaff_tpu.model import QuaffNullParams, default_params
    from quaff_tpu.aligner import DPConfig
    from quaff_tpu.formats import AlignmentPrinter, OutputFormat
    from quaff_tpu.overlap import QuaffOverlapAligner
    from quaff_tpu.server import remote_overlap_all

    seqs = read_fast_seqs(str(data / "c8f30.fastq.gz")) + read_fast_seqs(str(copy))
    null = QuaffNullParams.fit(seqs)
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    printer = AlignmentPrinter(format=OutputFormat.STOCKHOLM)
    server = QuaffServer(
        "overlap", cfg, seqs, seqs, 2,
        printer=printer, params=default_params(), null_model=null,
    )
    port = _free_port()
    t = _start_server(server, port)
    worker = RemoteWorker("localhost", port)
    out = io.StringIO()
    aligner = QuaffOverlapAligner.__new__(QuaffOverlapAligner)
    remote_overlap_all(out, [worker], seqs, 2, printer, aligner.enumerate_pairs)
    worker.quit()
    t.join(timeout=5)
    assert out.getvalue() == (data / "c8f30-self-overlap.json").read_text()
