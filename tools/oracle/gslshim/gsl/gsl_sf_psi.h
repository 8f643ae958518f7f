/* digamma/trigamma shim: recurrence shift to x >= 10 plus the Bernoulli
 * asymptotic series (~1e-14 abs accuracy over the fit's domain) — the
 * same algorithm quaff_tpu/model/negbinom.py uses, so Python and oracle
 * fits agree to the solvers' own stopping tolerances. */
#pragma once
#include <cmath>

static inline double gsl_sf_psi(double x) {
  double result = 0.0;
  while (x < 10.0) {
    result -= 1.0 / x;
    x += 1.0;
  }
  const double inv = 1.0 / x, inv2 = inv * inv;
  const double series =
      inv2 * (-1.0 / 12.0 +
              inv2 * (1.0 / 120.0 +
                      inv2 * (-1.0 / 252.0 +
                              inv2 * (1.0 / 240.0 +
                                      inv2 * (-1.0 / 132.0 +
                                              inv2 * (691.0 / 32760.0 +
                                                      inv2 * (-1.0 / 12.0)))))));
  return result + std::log(x) - 0.5 * inv + series;
}

static inline double gsl_sf_psi_1(double x) {
  double result = 0.0;
  while (x < 10.0) {
    result += 1.0 / (x * x);
    x += 1.0;
  }
  const double inv = 1.0 / x, inv2 = inv * inv;
  /* 1/x + 1/2x^2 + sum B_2n / x^{2n+1} */
  const double series =
      inv * (1.0 +
             inv * (0.5 +
                    inv * (1.0 / 6.0 +
                           inv2 * (-1.0 / 30.0 +
                                   inv2 * (1.0 / 42.0 +
                                           inv2 * (-1.0 / 30.0 +
                                                   inv2 * (5.0 / 66.0)))))));
  return result + series;
}
