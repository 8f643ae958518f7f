"""E-step counts golden test, mirroring the reference integration test
(Makefile:146-147):
  quaff count data/c8f30.fastq.gz data/c8f30.fastq.gz -kmatchmb 10 -fwdstrand
must reproduce data/c8f30-self-counts.json byte for byte.
"""

import io

from quaff_tpu.aligner import DPConfig
from quaff_tpu.io import read_fast_seqs
from quaff_tpu.model import QuaffNullParams, default_params
from quaff_tpu.trainer import QuaffCounter


def test_c8f30_self_counts_golden(data_dir):
    reads = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    refs = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    for r in refs:
        r.qual = ""
    null = QuaffNullParams.fit(reads)
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    counter = QuaffCounter(default_params(), null, cfg)
    counts, loglike, orders = counter.get_counts(refs, reads)
    assert orders == [[0]]
    out = io.StringIO()
    counts.write_json(out)
    golden = (data_dir / "c8f30-self-counts.json").read_text()
    assert out.getvalue() == golden.rstrip("\n")


def test_fwd_back_consistency(data_dir):
    """Backward score must equal forward score within the reference's own
    tolerance (MAX_FRACTIONAL_FWDBACK_ERROR, qmodel.cpp:20)."""
    import jax.numpy as jnp
    import numpy as np

    from quaff_tpu.dp.counts import dp_forward_backward
    from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.envelope import make_envelope
    from quaff_tpu.io import KmerIndex

    reads = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    refs = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    for r in refs:
        r.qual = ""
    params = default_params()
    tables = ScoreTables.from_params(params)
    y = reads[0]
    env = make_envelope(
        refs[0], KmerIndex(y, 6), kmer_threshold=-1, cell_size=48, max_size=10 << 20
    )
    batch = PairBatch.build([(refs[0], y, env)], tables)
    res = dp_forward_backward(
        device_tables(tables),
        device_batch(batch),
        local=True,
        dtype=jnp.float64,
        num_match_kmers=4,
        num_indel_kmers=1,
    )
    fwd = float(np.asarray(res["fwd_score"])[0])
    back = float(np.asarray(res["back_score"])[0])
    assert abs(fwd - back) <= 1e-4 * abs(fwd)


def test_postmatrix_row_identity(data_dir, capsys):
    """`-log postmatrix` dumps per-cell posteriors from the counting
    E-step; each read row emits exactly one base, so row sums of
    postMatch + postInsert equal the pair posterior (=1 when only one
    ref can win)."""
    import sys

    import numpy as np

    from quaff_tpu.dp.debug import write_post_matrix
    from quaff_tpu.dp.engine import PairBatch, device_batch, device_tables
    from quaff_tpu.dp.counts import dp_forward_backward
    from quaff_tpu.dp.scores import ScoreTables
    from quaff_tpu.envelope import full_envelope
    from quaff_tpu.io.fastseq import FastSeq
    from quaff_tpu.model.params import default_params

    rng = np.random.default_rng(3)
    alpha = "ACGT"
    xs = "".join(alpha[t] for t in rng.integers(0, 4, 60))
    ys = xs[10:50]
    x = FastSeq(name="x", seq=xs)
    y = FastSeq(
        name="y", seq=ys,
        qual="".join(chr(33 + int(q)) for q in rng.integers(5, 30, len(ys))),
    )
    env = full_envelope(len(xs), len(ys))
    tables = ScoreTables.from_params(default_params())
    batch = PairBatch.build([(x, y, env)], tables)
    res = dp_forward_backward(
        device_tables(tables), device_batch(batch), local=True,
        num_match_kmers=4, num_indel_kmers=1, return_post=True,
    )
    pm = np.asarray(res["post_mat"][0], dtype=np.float64)
    pi = np.asarray(res["post_ins"][0], dtype=np.float64)
    row_mass = (pm + pi).sum(axis=1)[: len(ys)]
    np.testing.assert_allclose(row_mass, 1.0, rtol=1e-4)

    write_post_matrix(
        x, y, env, pm, pi, np.asarray(res["post_del"][0]), out=sys.stderr
    )
    err = capsys.readouterr().err
    first = err.splitlines()[0]
    assert first.startswith("i=1:") and "\tmat " in first and "\tdel " in first
