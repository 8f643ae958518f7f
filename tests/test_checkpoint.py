"""Checkpoint/resume: an interrupted+resumed EM run must produce the
identical trajectory and final parameters as an uninterrupted run."""

import io

from quaff_tpu.aligner import DPConfig
from quaff_tpu.io import read_fast_seqs
from quaff_tpu.model import QuaffNullParams
from quaff_tpu.model.params import QuaffParamCounts
from quaff_tpu.trainer import QuaffTrainer


def _setup(data_dir):
    reads = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    refs = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))
    for r in refs:
        r.qual = ""
    null = QuaffNullParams.fit(reads)
    prior = QuaffParamCounts.zero(1, 0)
    prior.init_counts(9, 9, 5, 1, null)
    seed = prior.fit()
    cfg = DPConfig(kmer_threshold=-1, max_size=10 << 20)
    return refs, reads, seed, null, prior, cfg


def _params_json(qp) -> str:
    out = io.StringIO()
    qp.write_json(out)
    return out.getvalue()


def test_resume_matches_uninterrupted(data_dir, tmp_path):
    refs, reads, seed, null, prior, cfg = _setup(data_dir)

    # uninterrupted 2-iteration run
    full = QuaffTrainer(max_iterations=2).fit(refs, reads, seed, null, prior, cfg)

    # 1 iteration with checkpointing, then resume to 2
    ckpt = str(tmp_path / "ckpt")
    QuaffTrainer(max_iterations=1, checkpoint_dir=ckpt).fit(
        refs, reads, seed, null, prior, cfg
    )
    logs = []
    resumed = QuaffTrainer(max_iterations=2, checkpoint_dir=ckpt).fit(
        refs, reads, seed, null, prior, cfg, log=logs.append
    )
    assert any("Resuming from checkpoint at EM iteration 1" in m for m in logs)
    assert _params_json(resumed) == _params_json(full)
