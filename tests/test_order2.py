"""Order-2 match-context coverage (SURVEY 'hard parts': the match table
grows 4x per +1 order — Km = 4^(k+1) = 64 distributions at -suborder 2).

Oracles generated with the reference binary (tools/oracle/build_ref.sh):
  quaff train synth12-genome.fasta synth12.fastq -kmatchn 10 -fwdstrand
        -force -maxiter 2 -suborder 2    -> synth12-train-order2.oracle.json
  quaff align synth12-genome.fasta synth12.fastq -kmatchn 10 -nothreshold
        -params <that json>              -> synth12-align-order2.oracle.stk
(The reference's overlap at order 2 rebuilds a 36M-entry pair table PER
PAIR and does not finish in reasonable time — no overlap oracle; our
hoisted build is exercised by the kernel-vs-engine equivalence tests.)

refBase is excluded from the train comparison (reference UB, see
test_train_golden.py).
"""

import json

from test_cli import _run


def test_train_order2_matches_oracle(data_dir):
    rc, out = _run(
        [
            "train",
            str(data_dir / "synth12-genome.fasta"),
            str(data_dir / "synth12.fastq"),
            "-kmatchn", "10", "-fwdstrand", "-force",
            "-maxiter", "2", "-suborder", "2",
        ]
    )
    assert rc == 0
    mine = json.loads(out)
    want = json.loads(
        (data_dir / "synth12-train-order2.oracle.json").read_text()
    )
    assert mine["matchOrder"] == want["matchOrder"] == 3

    mismatches = []

    def cmp(a, b, path=""):
        if isinstance(a, dict):
            assert a.keys() == b.keys(), path
            for k in a:
                cmp(a[k], b[k], path + "/" + k)
        elif isinstance(a, (int, float)):
            if path.startswith("/refBase"):
                return  # reference UB (uninitialised totalLen)
            if abs(float(a) - float(b)) > 1e-4 + 2e-3 * abs(float(b)):
                mismatches.append((path, a, b))

    cmp(mine, want)
    assert mismatches == []


def test_align_order2_matches_oracle(data_dir):
    rc, out = _run(
        [
            "align",
            str(data_dir / "synth12-genome.fasta"),
            str(data_dir / "synth12.fastq"),
            "-kmatchn", "10", "-nothreshold",
            "-params", str(data_dir / "synth12-train-order2.oracle.json"),
        ]
    )
    assert rc == 0
    assert out == (data_dir / "synth12-align-order2.oracle.stk").read_text()


def test_mesh_align_order2_matches_oracle(data_dir):
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rc, out = _run(
        [
            "align",
            str(data_dir / "synth12-genome.fasta"),
            str(data_dir / "synth12.fastq"),
            "-kmatchn", "10", "-nothreshold", "-mesh",
            "-params", str(data_dir / "synth12-train-order2.oracle.json"),
        ]
    )
    assert rc == 0
    assert out == (data_dir / "synth12-align-order2.oracle.stk").read_text()


def test_overlap_order2_self_consistency(data_dir, monkeypatch):
    """Overlap at -suborder 2 (matchOrder 3, Km=64): the REFERENCE
    cannot run this config in practice — it rebuilds the
    (Km*Q)^2-entry pair emission table PER PAIR (qoverlap.cpp:53-74,
    ~36M entries) and does not finish; the repo hoists the build once
    per params object, making order-2 overlap tractable.  No oracle
    exists, so pin path self-consistency instead: the production
    pipeline (kernel-scored winnowing + native exact pass), the
    kernel-scored pipeline WITHOUT the early-exact split, and the pure
    XLA matrix path (native disabled) must emit byte-identical
    Stockholm."""
    import io
    import json

    from quaff_tpu import native as natmod
    from quaff_tpu.aligner import DPConfig
    from quaff_tpu.formats.alignment import AlignmentPrinter
    from quaff_tpu.io.fastseq import add_revcomps, read_fast_seqs
    from quaff_tpu.model.params import QuaffNullParams, QuaffParams
    from quaff_tpu.overlap import QuaffOverlapAligner

    params = QuaffParams.from_json(
        json.loads(
            (data_dir / "synth12-train-order2.oracle.json").read_text()
        )
    )
    assert params.match_kmer_len == 3  # suborder 2
    # the oracle file's refBase carries the reference's uninitialised
    # totalLen UB (see test_train_golden) — garbage values NaN the
    # overlap null tables; replace with a valid distribution
    import numpy as np

    params.ref_base = np.full(4, 0.25)
    reads = read_fast_seqs(str(data_dir / "synth12.fastq"))[:5]
    null = QuaffNullParams.fit(reads)
    seqs = add_revcomps(reads)
    config = DPConfig(kmer_threshold=10)
    printer = AlignmentPrinter()
    printer.log_odds_threshold = float("-inf")

    def run():
        ov = QuaffOverlapAligner(params, null, config)
        out = io.StringIO()
        ov.align_all(out, seqs, len(reads), printer)
        return out.getvalue()

    a = run()  # production: kernel winnowing + native exact pass
    assert a.count("#=GF Score") == len(reads) * (len(reads) - 1) * 3 // 2

    monkeypatch.setenv("QUAFF_OV_EARLY_EXACT", "0")
    b = run()  # every pair kernel-scored before the exact pass
    assert b == a

    monkeypatch.delenv("QUAFF_OV_EARLY_EXACT")
    monkeypatch.setattr(natmod, "get_lib", lambda auto_build=False: None)
    c = run()  # pure XLA matrix path (batched f64 fills + traceback)
    assert c == a
