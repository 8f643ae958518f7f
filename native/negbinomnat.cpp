// Native negative-binomial fit evaluations (round 4).
//
// The ulp-parity rework made the Python profile-likelihood loops scalar
// (94 ctypes libm calls per evaluation) — ~90 ms per M-step fit pass and
// ~20 ms per null fit.  These C versions replicate the EXACT arithmetic
// op-for-op (same libm entry points, same association order, the same
// digamma/trigamma recurrence + asymptotic series as
// quaff_tpu/model/negbinom.py — which itself mirrors the reference's GSL
// shim), so results are bitwise identical to the Python path; pinned by
// tests/test_negbinom.py::test_native_matches_python_bitwise.
//
// Loop-invariant subexpressions (lgamma(r), log(p), log1p(-p)) are
// hoisted: recomputing a pure function of unchanged inputs returns the
// identical bits, so hoisting cannot change results.

#include <cmath>
#include <cstdint>

namespace {

// psi(x), x > 0 — mirrors negbinom._digamma (recurrence + asymptotics)
static double digamma_(double x) {
  double result = 0.0;
  while (x < 10.0) {
    result -= 1.0 / x;
    x += 1.0;
  }
  const double inv = 1.0 / x;
  const double inv2 = inv * inv;
  const double series =
      inv2 *
      (-1.0 / 12.0 +
       inv2 * (1.0 / 120.0 +
               inv2 * (-1.0 / 252.0 +
                       inv2 * (1.0 / 240.0 +
                               inv2 * (-1.0 / 132.0 +
                                       inv2 * (691.0 / 32760.0))))));
  return result + std::log(x) - 0.5 * inv + series;
}

// psi'(x) — mirrors negbinom._trigamma
static double trigamma_(double x) {
  double result = 0.0;
  while (x < 10.0) {
    result += 1.0 / (x * x);
    x += 1.0;
  }
  const double inv = 1.0 / x;
  const double inv2 = inv * inv;
  const double series =
      inv *
      (1.0 + inv * (0.5 + inv * (1.0 / 6.0 +
                                 inv2 * (-1.0 / 30.0 +
                                         inv2 * (1.0 / 42.0 +
                                                 inv2 * (-1.0 / 30.0))))));
  return result + series;
}

}  // namespace

extern "C" {

// log NB(k; p, n) in the reference's exact op sequence: the log-gamma
// exponent left-to-right, ROUND-TRIPPED through exp and log
// (negbinom.cpp:30 + the GSL pdf shim)
double qdp_lognb(double k, double p, double n) {
  const double f = std::lgamma(k + n);
  const double a = std::lgamma(n);
  const double b = std::lgamma(k + 1.0);
  const double core =
      ((f - a) - b) + n * std::log(p) + k * std::log1p(-p);
  return std::log(std::exp(core));
}

// sum_k freq[k] * log NB(k; p, n), sequential over ALL k (including
// zero-frequency bins — 0 * (-inf) reproduces the reference's NaN
// semantics when the pdf underflows)
double qdp_lognb_freq(const double* freq, int64_t n_bins, double p,
                      double r) {
  const double a = std::lgamma(r);
  const double lp_p = std::log(p);
  const double l1p = std::log1p(-p);
  double lp = 0.0;
  for (int64_t k = 0; k < n_bins; ++k) {
    const double f = std::lgamma((double)k + r);
    const double b = std::lgamma((double)k + 1.0);
    const double core = ((f - a) - b) + r * lp_p + (double)k * l1p;
    lp += freq[k] * std::log(std::exp(core));
  }
  return lp;
}

// d/dn of the profile log-likelihood — mirrors negbinom._deriv1
// (nonzero bins ascending, same accumulation order)
double qdp_nb_deriv1(const double* freq, int64_t n_bins, double n) {
  double freq_sum = 0.0, k_sum = 0.0, k_digamma_sum = 0.0;
  for (int64_t k = 0; k < n_bins; ++k) {
    if (freq[k] == 0.0) continue;
    const double f = freq[k];
    freq_sum += f;
    k_sum += f * (double)k;
    k_digamma_sum += f * digamma_(n + (double)k);
  }
  return -freq_sum * std::log(1.0 + k_sum / (freq_sum * n)) -
         freq_sum * digamma_(n) + k_digamma_sum;
}

// d2/dn2 — mirrors negbinom._deriv2
double qdp_nb_deriv2(const double* freq, int64_t n_bins, double n) {
  double freq_sum = 0.0, k_trigamma_sum = 0.0;
  for (int64_t k = 0; k < n_bins; ++k) {
    if (freq[k] == 0.0) continue;
    const double f = freq[k];
    freq_sum += f;
    k_trigamma_sum += f * trigamma_(n + (double)k);
  }
  return -freq_sum * trigamma_(n) + k_trigamma_sum;
}

}  // extern "C"

extern "C" {

// out[k] = log NB(k; p, r) for k = 0..n_bins-1 — the SymQualScores
// column (qmodel.cpp:87-93); each entry bitwise equal to qdp_lognb(k)
void qdp_lognb_row(double* out, int64_t n_bins, double p, double r) {
  const double a = std::lgamma(r);
  const double lp_p = std::log(p);
  const double l1p = std::log1p(-p);
  for (int64_t k = 0; k < n_bins; ++k) {
    const double f = std::lgamma((double)k + r);
    const double b = std::lgamma((double)k + 1.0);
    const double core = ((f - a) - b) + r * lp_p + (double)k * l1p;
    out[k] = std::log(std::exp(core));
  }
}

}  // extern "C"
