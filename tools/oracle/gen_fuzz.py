"""Generate randomized parity workloads (ref FASTA + reads FASTQ).

Two profiles:
  * low    — 2% mismatch, 1% indel (round-2 fresh-workload style)
  * tierich — 10% mismatch, 9% indel with repeat-seeded reference
    (reproduces the round-3 judge's tie-class traceback divergence:
    equal-scoring delete placements around short repeats).

Usage: python tools/oracle/gen_fuzz.py OUTDIR [--seed N] [--profile tierich]
       [--reflen 1500] [--reads 6]

Deterministic given the seed (numpy Generator).  Used by
tests/test_fuzz_parity.py and by hand against the oracle binary
(tools/oracle/build_ref.sh).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

BASES = "ACGT"


def make_ref(rng: np.random.Generator, n: int, repeat_rich: bool) -> str:
    if not repeat_rich:
        return "".join(BASES[i] for i in rng.integers(0, 4, size=n))
    # Repeat-seeded: build from short motifs repeated 1-4 times so that
    # equal-scoring indel placements (the tie class) are common.
    out = []
    while sum(len(s) for s in out) < n:
        mlen = int(rng.integers(1, 5))
        motif = "".join(BASES[i] for i in rng.integers(0, 4, size=mlen))
        out.append(motif * int(rng.integers(1, 5)))
    return "".join(out)[:n]


def mutate(rng: np.random.Generator, ref: str, sub: float, ins: float,
           dele: float) -> tuple[str, str]:
    """Simulate a read off the whole reference; returns (seq, qual)."""
    seq = []
    for ch in ref:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            seq.append(BASES[int(rng.integers(0, 4))])
        b = ch
        if rng.random() < sub:
            b = BASES[int(rng.integers(0, 4))]
        seq.append(b)
    qual = "".join(chr(33 + int(q)) for q in rng.integers(10, 40, size=len(seq)))
    return "".join(seq), qual


def generate(outdir: str, seed: int, profile: str, reflen: int, nreads: int):
    rng = np.random.default_rng(seed)
    tierich = profile == "tierich"
    ref = make_ref(rng, reflen, repeat_rich=tierich)
    sub, ins, dele = (0.10, 0.045, 0.045) if tierich else (0.02, 0.005, 0.005)
    os.makedirs(outdir, exist_ok=True)
    fa = os.path.join(outdir, f"{profile}-ref.fasta")
    fq = os.path.join(outdir, f"{profile}-reads.fastq")
    with open(fa, "w") as f:
        f.write(f">ref{seed}\n{ref}\n")
    with open(fq, "w") as f:
        for i in range(nreads):
            seq, qual = mutate(rng, ref, sub, ins, dele)
            f.write(f"@read{i}\n{seq}\n+\n{qual}\n")
    return fa, fq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--profile", default="tierich", choices=["low", "tierich"])
    ap.add_argument("--reflen", type=int, default=1500)
    ap.add_argument("--reads", type=int, default=6)
    a = ap.parse_args()
    fa, fq = generate(a.outdir, a.seed, a.profile, a.reflen, a.reads)
    print(fa)
    print(fq)


if __name__ == "__main__":
    main()
