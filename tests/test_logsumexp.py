"""Slow-vs-fast log-sum-exp equivalence (testlogsumexp.cpp).

The reference generates a golden grid with `-slow` (exact
log1p(exp(-diff))) and diffs the `-fast` (100k-entry linear-interp
lookup table) output against it — the approximation must match exact to
printed precision.  Our production DP recursions use exact logaddexp;
`_ref_lse` (dp/overlap.py) emulates the reference table's TRUNCATION
(contributions >= 10 nats below the max are dropped,
logsumexp.cpp:105-117 LOG_SUM_EXP_LOOKUP_MAX) where committed goldens
encode it.  This test pins both the printed-precision equivalence and
the truncation/NaN-guard semantics, plus the C chain's bit-equivalence
to the numpy loop (native/quaffio.cpp qref_lse_chain).
"""

import numpy as np
import pytest

from quaff_tpu.dp.overlap import _ref_lse, _ref_lse_chain


def _cxx_print(v: float) -> str:
    """C++ default `cout <<` formatting for doubles (6 significant
    digits), as testexpect.pl diffs it."""
    return f"{v:.6g}"


def test_fast_matches_slow_to_printed_precision():
    """The testlogsumexp.cpp grid: x, y in [0, 2) step 0.1 — the fast
    path's printed values must equal the exact path's."""
    for x in np.arange(0.0, 2.0, 0.1):
        for y in np.arange(0.0, 2.0, 0.1):
            slow = np.logaddexp(x, y)
            fast = float(_ref_lse(np.float64(x), np.float64(y)))
            assert _cxx_print(fast) == _cxx_print(slow), (x, y)


def test_truncation_at_ten_nats():
    """log_sum_exp_unary returns 0 for diff >= LOG_SUM_EXP_LOOKUP_MAX=10
    (logsumexp.cpp:105-110): the smaller term is dropped entirely."""
    assert float(_ref_lse(np.float64(0.0), np.float64(-10.0))) == 0.0
    assert float(_ref_lse(np.float64(-10.0), np.float64(0.0))) == 0.0
    # just inside the table the correction is applied
    inside = float(_ref_lse(np.float64(0.0), np.float64(-9.99)))
    assert inside == pytest.approx(np.logaddexp(0.0, -9.99), abs=1e-12)
    assert inside > 0.0


def test_infinity_guards():
    """The exact-equality NaN guard (logsumexp.cpp:34-51): -inf + -inf
    stays -inf instead of NaN, and inf/-inf mixes return the max."""
    ninf = np.float64(-np.inf)
    assert float(_ref_lse(ninf, ninf)) == -np.inf
    assert float(_ref_lse(np.float64(1.5), ninf)) == 1.5
    assert float(_ref_lse(ninf, np.float64(1.5))) == 1.5
    inf = np.float64(np.inf)
    assert float(_ref_lse(inf, inf)) == np.inf


def test_chain_native_bit_identical_to_numpy():
    """The C ordered chain must be bit-identical to the numpy loop —
    overlap pair tables are accumulated through it and the goldens
    encode its exact float ops."""
    from quaff_tpu.native import ref_lse_chain_native

    rng = np.random.default_rng(7)
    acc0 = rng.normal(size=(5, 9)) * 5.0
    terms = rng.normal(size=(23, 5, 9)) * 5.0
    # sprinkle -inf and >=10-nat gaps so both branches are exercised
    terms[3] = -np.inf
    terms[11] += 40.0

    want = acc0.copy()
    for t in range(terms.shape[0]):
        want = _ref_lse(want, terms[t])

    got = acc0.copy()
    if not ref_lse_chain_native(got, terms):
        pytest.skip("native library not built")
    np.testing.assert_array_equal(got, want)

    # the public chain entry point picks whichever is available and
    # must agree either way
    chained = _ref_lse_chain(acc0.copy(), terms)
    np.testing.assert_array_equal(chained, want)
