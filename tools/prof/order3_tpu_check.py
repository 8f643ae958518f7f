"""Order-3 (-suborder 3, Km=256) hardware validation on the attached TPU.

SURVEY 'hard parts' order-k blowup: the match table grows 4x per +1
order; at -suborder 3 the split emission layout is [256, 4*128] per
qual channel.  This script drives the PRODUCTION kernel paths (align
fast path via pallas_v2, train E-step via pallas_counts) at order 3 on
whatever accelerator JAX exposes and compares against the committed
reference-binary oracles (tests/data/synth12-*order3.oracle.*):

  align: byte-identical Stockholm output (the winner traceback is the
         f64 CPU path, but candidate scoring/pruning runs the v2 kernel
         with Km=256 tables — any kernel divergence changes the output)
  train: 2-iteration EM counts vs the oracle fit at the same
         1e-4 + 2e-3 relative tolerance test_order3 pins on CPU (the
         E-step runs the fused Pallas kernel in f32 on TPU)

Run me with the TPU attached (ONE TPU process at a time):
    timeout 590 python tools/prof/order3_tpu_check.py
Prints PASS/FAIL per check; record the run in CLAUDE.md.
"""
import contextlib
import io
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from quaff_tpu.cli import main  # noqa: E402

DATA = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data"


def run(argv):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main(argv)
    assert rc == 0, argv
    return out.getvalue()


def check_align():
    t0 = time.perf_counter()
    out = run(
        [
            "align", str(DATA / "synth12-genome.fasta"),
            str(DATA / "synth12.fastq"),
            "-kmatchn", "10", "-nothreshold",
            "-params", str(DATA / "synth12-train-order3.oracle.json"),
        ]
    )
    want = (DATA / "synth12-align-order3.oracle.stk").read_text()
    ok = out == want
    print(
        f"align -suborder 3 (Km=256) kernel path: "
        f"{'PASS (byte-identical)' if ok else 'FAIL'} "
        f"[{time.perf_counter() - t0:.1f}s]"
    )
    return ok


def check_train():
    t0 = time.perf_counter()
    out = run(
        [
            "train", str(DATA / "synth12-genome.fasta"),
            str(DATA / "synth12.fastq"),
            "-kmatchn", "10", "-fwdstrand", "-force",
            "-maxiter", "2", "-suborder", "3",
        ]
    )
    mine = json.loads(out)
    want = json.loads(
        (DATA / "synth12-train-order3.oracle.json").read_text()
    )
    mismatches = []

    def cmp(a, b, path=""):
        if isinstance(a, dict):
            assert a.keys() == b.keys(), path
            for k in a:
                cmp(a[k], b[k], path + "/" + k)
        elif isinstance(a, (int, float)):
            if path.startswith("/refBase"):
                return  # reference UB
            if abs(float(a) - float(b)) > 1e-4 + 2e-3 * abs(float(b)):
                mismatches.append((path, a, b))

    cmp(mine, want)
    ok = mine["matchOrder"] == 4 and not mismatches
    print(
        f"train -suborder 3 kernel E-step: "
        f"{'PASS' if ok else f'FAIL {mismatches[:5]}'} "
        f"[{time.perf_counter() - t0:.1f}s]"
    )
    return ok


if __name__ == "__main__":
    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    ok = check_align() & check_train()
    sys.exit(0 if ok else 1)
