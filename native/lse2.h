// Shared log-sum-exp for the native DP fills (overlapdp.cpp,
// tracebackdp.cpp).  Header-only so every translation unit inlines the
// IDENTICAL arithmetic: the checkpointed fill+traceback routines must
// produce cells bitwise equal to the stored fills'.
//
// jnp.logaddexp semantics, -inf transparent, evaluated as
// m + softplus(d) with softplus(d) = log1p(exp(-d)).
//
// The serial in-row delete chain is latency-bound on this function
// (lse2 -> max2 -> next lane), so softplus runs off a precomputed
// quintic-Hermite table instead of the two libm transcendentals:
// 1024 intervals over [0, 37.5], coefficients from exact f/f'/f'' at
// the interval ends.  Interpolation error is bounded by
// h^6 * max|f^(6)| / 46080 ~ 2e-14 absolute per call (h = 37.5/1024,
// |f^(6)| < 0.3), i.e. a few ulps of the softplus value — far inside
// the 1e-11 native-vs-XLA cell tolerance even after accumulating over
// ~10^4-row DP paths (test_native_overlap_fill_matches_xla), and
// invisible at the 6-significant-digit score printing the golden tests
// pin.
//
// Fast exit: when exp(-d) is smaller than half an ulp of m, the exact
// result m + log1p(exp(-d)) rounds to m (log1p(x) <= x, and adding
// anything < ulp(m)/2 to m returns m under round-to-nearest).
// exp(-d) < 2^-54 for d > 54*ln2 ~ 37.43 covers |m| >= 1 including the
// worst case (m exactly a negative power of two, where the spacing
// toward zero is half an ulp); the |m| >= 1 guard keeps the tiny-|m|
// cases (spacing below 2^-53) on the exact libm path, which also
// catches NaN inputs (both branch tests fail).

#ifndef QUAFF_NATIVE_LSE2_H_
#define QUAFF_NATIVE_LSE2_H_

#include <cmath>
#include <limits>

namespace quaff_lse {

const double NEG_INF = -std::numeric_limits<double>::infinity();

struct SoftplusTable {
  static constexpr int N = 1024;
  static constexpr double D_MAX = 37.5;
  double inv_h;
  double coef[N][6];  // Horner coefficients in t = (d - k*h)/h
  SoftplusTable() {
    const double h = D_MAX / N;
    inv_h = 1.0 / h;
    for (int k = 0; k < N; ++k) {
      const double x0 = k * h, x1 = x0 + h;
      const double e0 = std::exp(-x0), e1 = std::exp(-x1);
      const double f0 = std::log1p(e0), f1 = std::log1p(e1);
      const double d0 = -h * e0 / (1.0 + e0);          // h * f'(x0)
      const double d1 = -h * e1 / (1.0 + e1);
      const double s0 = h * h * e0 / ((1.0 + e0) * (1.0 + e0));  // h^2 f''
      const double s1 = h * h * e1 / ((1.0 + e1) * (1.0 + e1));
      const double A = f1 - f0 - d0 - 0.5 * s0;
      const double B = d1 - d0 - s0;
      const double C = s1 - s0;
      coef[k][0] = f0;
      coef[k][1] = d0;
      coef[k][2] = 0.5 * s0;
      coef[k][3] = 10.0 * A - 4.0 * B + 0.5 * C;
      coef[k][4] = -15.0 * A + 7.0 * B - C;
      coef[k][5] = 6.0 * A - 3.0 * B + 0.5 * C;
    }
  }
  inline double operator()(double d) const {
    const double u = d * inv_h;
    const int k = (int)u;
    const double t = u - (double)k;
    const double* c = coef[k];
    return c[0] +
           t * (c[1] + t * (c[2] + t * (c[3] + t * (c[4] + t * c[5]))));
  }
};

// one table instance per translation unit; the constructor is
// deterministic (pure libm on fixed inputs), so every copy is identical
static const SoftplusTable softplus_table;

static inline double lse2(double a, double b) {
  if (a == NEG_INF) return b;
  if (b == NEG_INF) return a;
  double m = a > b ? a : b;
  double d = a > b ? a - b : b - a;
  if (d < SoftplusTable::D_MAX) return m + softplus_table(d);
  // d >= D_MAX test (not an else) so NaN d falls through to the exact
  // path and propagates instead of taking the fast exit
  if (d >= SoftplusTable::D_MAX && (m >= 1.0 || m <= -1.0)) return m;
  return m + std::log1p(std::exp(-d));
}

// Row-wise lse2: out[w] = lse2(a[w], b[w]) for w in [0, n), BITWISE
// identical to the scalar function.  The common path (both finite,
// d < D_MAX) is written branch-free so the compiler vectorises it
// (table gathers + Horner); exceptional lanes (-inf operands, d beyond
// the table, NaN) are flagged during the vector pass — the speculative
// per-lane ops stay in-bounds via a clamped gather index — and recomputed
// with the scalar lse2 afterwards.  a/b/out must not alias.
static inline void lse2_row(const double* __restrict a,
                            const double* __restrict b,
                            double* __restrict out, long long n) {
  const double inv_h = softplus_table.inv_h;
  const double* __restrict cf = &softplus_table.coef[0][0];
  const int NMAX = SoftplusTable::N - 1;
  long long n_exc = 0;
#pragma omp simd reduction(+ : n_exc)
  for (long long w = 0; w < n; ++w) {
    const double av = a[w], bv = b[w];
    const double m = av > bv ? av : bv;
    const double d = av > bv ? av - bv : bv - av;
    // exceptional lanes take 0 here so the (int) conversion below stays
    // defined; their out value is recomputed scalar anyway
    const double dsafe = d < SoftplusTable::D_MAX ? d : 0.0;
    const double u = dsafe * inv_h;
    const int k = (int)u;
    const int kc = k > NMAX ? NMAX : (k < 0 ? 0 : k);
    const double t = u - (double)k;
    const long long c6 = (long long)kc * 6;
    const double sp =
        cf[c6] +
        t * (cf[c6 + 1] +
             t * (cf[c6 + 2] +
                  t * (cf[c6 + 3] + t * (cf[c6 + 4] + t * cf[c6 + 5]))));
    // bitwise | (not ||): short-circuiting introduces control flow that
    // blocks vectorisation
    const int exc = (int)!(d < SoftplusTable::D_MAX) |
                    (int)(av == NEG_INF) | (int)(bv == NEG_INF);
    out[w] = exc ? m : m + sp;
    n_exc += exc;
  }
  if (n_exc)
    for (long long w = 0; w < n; ++w) {
      const double av = a[w], bv = b[w];
      const double d = av > bv ? av - bv : bv - av;
      if (!(d < SoftplusTable::D_MAX) || av == NEG_INF || bv == NEG_INF)
        out[w] = lse2(av, bv);
    }
}

}  // namespace quaff_lse

#endif  // QUAFF_NATIVE_LSE2_H_
