"""Measure the reference binary on the EXACT long-read workloads of
tools/prof/longread_probe.py (same rng seed, same genome, same reads).

Two reference configs per length:
  * fitted: -kmatchmb M (the reference's own memory-budget banding walk,
    diagenv.cpp:60-106 — the config it would realistically run long
    reads with; M defaults to 1024 MB, generous vs the repo's 4096-lane
    caps)
  * default: fixed -kmatchn 14 (what a naive invocation pays: spurious
    threshold-level seed clusters across the whole diagonal range)
    — only attempted at the shortest length unless --default-all (it
    is the ~219 s/pair regime).

Prints one JSON object per length; paste the fitted walls into
docs/manual.md "Long reads".

    python tools/oracle/measure_longread_ref.py [lengths...] [--mb=1024]
"""
import json
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from quaff_tpu.io.fastseq import FastSeq

QUAFF = "/tmp/quaffref/quaff"
BASES = "ACGT"

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parents[1] / "prof")
)
from longread_probe import make_reads  # noqa: E402  (same workload gen)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lengths = [int(a) for a in args] or [6600, 25000, 50000, 100000]
    mb = 1024
    default_all = False
    for a in sys.argv[1:]:
        if a.startswith("--mb="):
            mb = int(a.split("=")[1])
        if a == "--default-all":
            default_all = True

    rng = np.random.default_rng(42)
    G = int(max(lengths) * 1.25)
    genome = "".join(BASES[i] for i in rng.integers(0, 4, size=G))
    scratch = tempfile.mkdtemp(prefix="quaffref-longread-")
    gpath = pathlib.Path(scratch) / "genome.fasta"
    with open(gpath, "w") as fh:
        fh.write(">genome\n")
        fh.write(genome + "\n")

    nreads = 4
    for L in lengths:
        reads = make_reads(rng, genome, L, nreads)
        rpath = pathlib.Path(scratch) / f"reads{L}.fastq"
        with open(rpath, "w") as fh:
            for r in reads:
                r.write_fastq(fh)

        def timed(extra, n=2, timeout=3600):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                try:
                    subprocess.run(
                        [QUAFF, "align", str(gpath), str(rpath),
                         "-nothreshold"] + extra,
                        stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL,
                        cwd=scratch, timeout=timeout,
                    )
                except subprocess.TimeoutExpired:
                    return None
                ts.append(time.perf_counter() - t0)
            return min(ts)

        fitted = timed(["-kmatchmb", str(mb)])
        out = {
            "length": L, "reads": nreads, "kmatchmb": mb,
            "fitted_wall_s": round(fitted, 2) if fitted else None,
            "fitted_reads_per_sec": (
                round(nreads / fitted, 3) if fitted else None
            ),
        }
        if L == min(lengths) or default_all:
            dflt = timed(["-kmatchn", "14"], n=1)
            out["kmatchn14_wall_s"] = round(dflt, 2) if dflt else None
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
