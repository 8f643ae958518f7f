"""Strip decomposition: multi-cluster envelopes split into independent
diagonal strips whose combined scores equal the bounding-band fill."""

import numpy as np
import pytest

import jax.numpy as jnp

from quaff_tpu.dp.engine import (
    PairBatch,
    combine_strip_scores,
    device_batch,
    device_tables,
    dp_fill,
    expand_strips,
)
from quaff_tpu.dp.scores import ScoreTables
from quaff_tpu.envelope import make_envelope
from quaff_tpu.io.fastseq import KmerIndex, read_fast_seqs
from quaff_tpu.model.params import default_params


@pytest.fixture(scope="module")
def c8f30_pair(data_dir):
    y = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    x = read_fast_seqs(str(data_dir / "c8f30.fastq.gz"))[0]
    x.qual = ""
    env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=14, cell_size=24)
    return x, y, env


def test_strips_partition_diagonals(c8f30_pair):
    _, _, env = c8f30_pair
    strips = env.strips()
    assert len(strips) == 3  # self-alignment: repeat clusters at +-~170
    got = np.concatenate([s.diagonals for s in strips])
    np.testing.assert_array_equal(got, env.diagonals)
    for s in strips:
        assert np.all(np.diff(s.diagonals) == 1)
    assert sum(s.num_cells for s in strips) == env.num_cells
    # strips are narrower than the bounding band
    assert max(s.band_width for s in strips) < env.band_width


@pytest.mark.parametrize("mode", ["viterbi", "forward"])
def test_strip_scores_match_bounding_band(c8f30_pair, mode):
    x, y, env = c8f30_pair
    tables = ScoreTables.from_params(default_params())
    tdev = device_tables(tables)

    full = dp_fill(
        tdev,
        device_batch(PairBatch.build([(x, y, env)], tables)),
        mode=mode,
        local=True,
        return_matrices=False,
        dtype=jnp.float64,
    )["score"]

    strip_pairs, owner = expand_strips([(x, y, env)])
    assert len(strip_pairs) == 3
    per_strip = dp_fill(
        tdev,
        device_batch(PairBatch.build(strip_pairs, tables)),
        mode=mode,
        local=True,
        return_matrices=False,
        dtype=jnp.float64,
    )["score"]
    combined = combine_strip_scores(per_strip, owner, 1, mode=mode)
    np.testing.assert_allclose(
        combined, np.asarray(full, dtype=np.float64), rtol=1e-12, atol=1e-9
    )


def test_single_run_envelope_is_one_strip(c8f30_pair):
    x, y, _ = c8f30_pair
    env = make_envelope(x, KmerIndex(y, 6), kmer_threshold=20, cell_size=24)
    strips = env.strips()
    assert len(strips) == 1
    np.testing.assert_array_equal(strips[0].diagonals, env.diagonals)
