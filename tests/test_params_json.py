"""Parameter / null-model / counts JSON round-trip byte-parity tests.

Mirrors the reference's testquaffjsonio / testquaffnulljsonio /
testquaffcountsjsonio golden runs (Makefile:117-125): reading a JSON file
and re-writing it must reproduce the file byte for byte.
"""

import io

import numpy as np
import pytest

from quaff_tpu.model import (
    QuaffNullParams,
    QuaffParamCounts,
    QuaffParams,
    default_params,
)


def _roundtrip(cls, text: str) -> str:
    obj = cls.from_json(text)
    out = io.StringIO()
    obj.write_json(out)
    return out.getvalue()


@pytest.mark.parametrize("fname", ["testquaffparams.json", "defaultparams.json"])
def test_params_roundtrip(data_dir, fname):
    text = (data_dir / fname).read_text()
    assert _roundtrip(QuaffParams, text) == text.rstrip("\n")


def test_null_params_roundtrip(data_dir):
    text = (data_dir / "testquaffnullparams.json").read_text()
    assert _roundtrip(QuaffNullParams, text) == text.rstrip("\n")


def test_counts_roundtrip(data_dir):
    text = (data_dir / "testquaffcounts.json").read_text()
    assert _roundtrip(QuaffParamCounts, text) == text.rstrip("\n")


def test_default_params_loads():
    qp = default_params()
    assert qp.match_kmer_len == 1 and qp.indel_kmer_len == 0
    assert qp.match_prob.shape == (4, 4)
    # the reference's shipped parameter file is only approximately normalised
    np.testing.assert_allclose(np.sum(qp.match_prob, axis=1), 1.0, atol=0.05)
