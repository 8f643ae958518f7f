"""Read-length scaling probe: align + E-step through the production
kernels on 6.6 kb .. 100 kb nanopore-like reads (round-4 long-read
validation, reference memory-fitted banding diagenv.cpp:60-106).

Usage: python tools/prof/longread_probe.py [lengths ...] [--reads N]
Defaults: 6600 25000 50000 100000, 4 reads per length.

Generates a genome of 1.25x the longest read, samples reads at ~6%
mismatch / 4% indel (nanopore-ish), and times:
  * align (production kernel scoring + native winner traceback)
  * one train E-step
printing wall, in-envelope cells/s, and peak band width per length.
"""
import sys, pathlib, time, io
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np

from quaff_tpu.io.fastseq import FastSeq
from quaff_tpu.model.params import default_params, QuaffNullParams

BASES = "ACGT"


def make_reads(rng, genome, length, n, sub=0.06, ins=0.02, dele=0.02):
    reads = []
    for i in range(n):
        s0 = int(rng.integers(0, len(genome) - length))
        src = genome[s0 : s0 + length]
        seq = []
        for ch in src:
            r = rng.random()
            if r < dele:
                continue
            if r < dele + ins:
                seq.append(BASES[int(rng.integers(0, 4))])
            seq.append(
                BASES[int(rng.integers(0, 4))] if rng.random() < sub else ch
            )
        qual = "".join(
            chr(33 + int(q)) for q in rng.integers(10, 40, size=len(seq))
        )
        reads.append(FastSeq(name=f"rd{length}_{i}", seq="".join(seq), qual=qual))
    return reads


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lengths = [int(a) for a in args] or [6600, 25000, 50000, 100000]
    nreads = 4
    for a in sys.argv[1:]:
        if a.startswith("--reads"):
            nreads = int(a.split("=")[1])

    rng = np.random.default_rng(42)
    G = int(max(lengths) * 1.25)
    genome = "".join(BASES[i] for i in rng.integers(0, 4, size=G))
    ref = FastSeq(name="genome", seq=genome)

    from quaff_tpu.aligner import DPConfig, QuaffAligner
    from quaff_tpu.formats.alignment import AlignmentPrinter
    from quaff_tpu.trainer import QuaffTrainer
    from quaff_tpu.model.params import QuaffParamCounts

    params = default_params()

    for L in lengths:
        reads = make_reads(rng, genome, L, nreads)
        null = QuaffNullParams.fit(reads)
        config = DPConfig(threads=4)
        aligner = QuaffAligner(params, null, config)
        printer = AlignmentPrinter(log_odds_threshold=-1e30)

        # measure envelope geometry for the first read
        from quaff_tpu.io.fastseq import KmerIndex

        env = config.make_envelope(ref, KmerIndex(reads[0], config.kmer_len), 24)
        cells = int(env.member_mask().sum()) * (len(reads[0].seq) + 1)

        for it in range(2):  # first iter includes compiles
            out = io.StringIO()
            t0 = time.perf_counter()
            aligner.align_all(out, [ref], reads, printer)
            wall = time.perf_counter() - t0
            nlines = out.getvalue().count("\n")
            tag = "cold" if it == 0 else "warm"
            print(
                f"L={L} align[{tag}]: {wall:.2f}s {nreads} reads "
                f"({nreads / wall:.2f} reads/s) band_width={env.band_width} "
                f"cells~{cells} out_lines={nlines}",
                flush=True,
            )

        # one E-step
        trainer = QuaffTrainer(max_iterations=1,
                               min_fractional_loglike_increment=0.0,
                               allow_null_model=True)
        prior = QuaffParamCounts.zero(params.match_kmer_len,
                                      params.indel_kmer_len)
        prior.init_counts(9, 9, 5, 1, null)
        for it in range(2):
            t0 = time.perf_counter()
            trainer.fit([ref], reads, params, null, prior, config)
            wall = time.perf_counter() - t0
            tag = "cold" if it == 0 else "warm"
            print(f"L={L} estep[{tag}]: {wall:.2f}s {nreads} reads", flush=True)


if __name__ == "__main__":
    main()
