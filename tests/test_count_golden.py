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
