/* pdf shims (gsl_ran_*_pdf): the standard log-gamma formulations, same
 * as GSL's own implementations. */
#pragma once
#include <cmath>
#include <cstddef>

static inline double gsl_ran_negative_binomial_pdf(unsigned int k, double p,
                                                   double n) {
  const double f = std::lgamma(k + n);
  const double a = std::lgamma(n);
  const double b = std::lgamma(k + 1.0);
  return std::exp(f - a - b + n * std::log(p) + k * std::log1p(-p));
}

static inline double gsl_ran_beta_pdf(double x, double a, double b) {
  if (x < 0.0 || x > 1.0)
    return 0.0;
  const double lnb = std::lgamma(a) + std::lgamma(b) - std::lgamma(a + b);
  if (x == 0.0)
    return (a < 1.0) ? INFINITY : ((a > 1.0) ? 0.0 : std::exp(-lnb));
  if (x == 1.0)
    return (b < 1.0) ? INFINITY : ((b > 1.0) ? 0.0 : std::exp(-lnb));
  return std::exp((a - 1.0) * std::log(x) + (b - 1.0) * std::log1p(-x) - lnb);
}

static inline double gsl_ran_dirichlet_lnpdf(size_t K, const double alpha[],
                                             const double theta[]) {
  double log_p = 0.0, sum_alpha = 0.0;
  for (size_t i = 0; i < K; i++)
    log_p += (alpha[i] - 1.0) * std::log(theta[i]);
  for (size_t i = 0; i < K; i++)
    sum_alpha += alpha[i];
  log_p += std::lgamma(sum_alpha);
  for (size_t i = 0; i < K; i++)
    log_p -= std::lgamma(alpha[i]);
  return log_p;
}

static inline double gsl_ran_dirichlet_pdf(size_t K, const double alpha[],
                                           const double theta[]) {
  return std::exp(gsl_ran_dirichlet_lnpdf(K, alpha, theta));
}
