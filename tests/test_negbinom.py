"""Negative-binomial fit statistical-recovery test.

Mirrors the reference's testnegbinom (t/testnegbinom.cpp): sample from
NB(p=.1, r=5), fit, and require recovery within 10% relative error.
"""

import numpy as np

from quaff_tpu.model.negbinom import (
    _digamma,
    _trigamma,
    fit_negative_binomial,
    log_negative_binomial,
    negative_binomial_mean,
    negative_binomial_variance,
)


def test_digamma_trigamma():
    import mpmath

    for x in [0.3, 0.5, 1.0, 2.3, 6.0, 7.25, 10.5, 94.0, 321.0]:
        assert abs(_digamma(x) - float(mpmath.digamma(x))) < 1e-11
        assert abs(_trigamma(x) - float(mpmath.polygamma(1, x))) < 1e-11


def test_log_pdf_matches_closed_form():
    # NB(k; p, n): check against directly computed values
    # k=0: pdf = p^n
    assert abs(log_negative_binomial(0, 0.3, 2.5) - 2.5 * np.log(0.3)) < 1e-12
    # normalisation: sum over large support ~ 1
    ks = np.arange(500)
    from quaff_tpu.model.negbinom import log_negative_binomial_array

    total = np.exp(log_negative_binomial_array(ks, 0.4, 3.0)).sum()
    assert abs(total - 1.0) < 1e-10


def test_statistical_recovery():
    rng = np.random.default_rng(0)
    p_true, r_true, n_samples = 0.1, 5.0, 10000
    samples = rng.negative_binomial(r_true, p_true, size=n_samples)
    k_freq = np.bincount(samples)
    p_fit, r_fit = fit_negative_binomial(k_freq)
    assert abs(p_fit - p_true) / p_true < 0.1
    assert abs(r_fit - r_true) / r_true < 0.1


def test_underdispersed_runaway_kept():
    # variance < mean: moment fit fails, bracket falls back, Newton may run
    # away; fit must still return finite values (reference keeps the
    # runaway iterate, negbinom.cpp:293-314)
    k_freq = np.zeros(94)
    k_freq[10] = 50
    k_freq[11] = 50
    p, r = fit_negative_binomial(k_freq)
    assert np.isfinite(p) and np.isfinite(r)
    assert 0 < p < 1
    # mean of fit should be close to empirical mean 10.5
    assert abs(negative_binomial_mean(p, r) - 10.5) < 0.5


def test_native_matches_python_bitwise():
    """The C fit evaluations (native/negbinomnat.cpp) must be BITWISE
    equal to the Python loops — same libm, same op order."""
    import numpy as np

    from quaff_tpu.model import negbinom as nb

    lib = nb._nb_native()
    if lib is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    for trial in range(20):
        freq = rng.gamma(0.5, 10.0, size=94)
        freq[rng.random(94) < 0.3] = 0.0
        p = float(rng.uniform(0.01, 0.99))
        r = float(rng.uniform(0.1, 80.0))
        # force the Python paths by masking the native handle
        saved = nb._NB_NATIVE
        nb._NB_NATIVE = None
        py_lp = nb.log_negative_binomial_freq(freq, p, r)
        py_d1 = nb._deriv1(r, freq)
        py_d2 = nb._deriv2(r, freq)
        nb._NB_NATIVE = saved
        na_lp = nb.log_negative_binomial_freq(freq, p, r)
        na_d1 = nb._deriv1(r, freq)
        na_d2 = nb._deriv2(r, freq)
        assert py_lp == na_lp, (trial, py_lp, na_lp)
        assert py_d1 == na_d1, (trial, py_d1, na_d1)
        assert py_d2 == na_d2, (trial, py_d2, na_d2)


def test_native_row_matches_scalar_bitwise():
    import numpy as np

    from quaff_tpu.model import negbinom as nb

    if nb._nb_native() is None:
        import pytest

        pytest.skip("native library not built")
    k = np.arange(94)
    for p, r in ((0.3, 7.7), (0.05, 0.4), (0.97, 55.0)):
        row = nb.log_negative_binomial_array(k, p, r)
        for kk in (0, 1, 17, 93):
            assert row[kk] == nb.log_negative_binomial(kk, p, r)
