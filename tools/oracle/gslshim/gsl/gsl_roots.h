/* Root-solver shim: GSL's Brent bracketing solver and Newton
 * derivative solver, with GSL's interval/delta convergence tests —
 * exactly the algorithms and stopping rules the reference's
 * negative-binomial fit drives (negbinom.cpp:163-325).  The Brent
 * iterate is the standard GSL state machine; quaff_tpu/model/negbinom.py
 * mirrors the same loop so Python and oracle fits agree. */
#pragma once
#include <cmath>
#include <cstdlib>

#include "gsl_errno.h"
#include "gsl_math.h"

/* ---- bracketing (Brent) solver ---- */

typedef struct {
  const char *name;
} gsl_root_fsolver_type;

static const gsl_root_fsolver_type gsl_root_fsolver_brent_type = {"brent"};
#define gsl_root_fsolver_brent (&gsl_root_fsolver_brent_type)

typedef struct {
  const gsl_root_fsolver_type *type;
  gsl_function *function;
  double root, x_lower, x_upper;
  /* brent state */
  double a, b, c, d, e, fa, fb, fc;
} gsl_root_fsolver;

static inline gsl_root_fsolver *
gsl_root_fsolver_alloc(const gsl_root_fsolver_type *T) {
  gsl_root_fsolver *s = (gsl_root_fsolver *)std::calloc(1, sizeof(*s));
  s->type = T;
  return s;
}

static inline void gsl_root_fsolver_free(gsl_root_fsolver *s) {
  std::free(s);
}

static inline const char *gsl_root_fsolver_name(const gsl_root_fsolver *s) {
  return s->type->name;
}

static inline int gsl_root_fsolver_set(gsl_root_fsolver *s, gsl_function *f,
                                       double lo, double hi) {
  s->function = f;
  s->root = 0.5 * (lo + hi);
  s->x_lower = lo;
  s->x_upper = hi;
  s->a = lo;
  s->fa = GSL_FN_EVAL(f, lo);
  s->b = hi;
  s->fb = GSL_FN_EVAL(f, hi);
  s->c = hi;
  s->fc = s->fb;
  s->d = hi - lo;
  s->e = hi - lo;
  if ((s->fa < 0.0 && s->fb < 0.0) || (s->fa > 0.0 && s->fb > 0.0))
    return GSL_EINVAL; /* endpoints do not straddle */
  return GSL_SUCCESS;
}

static inline int gsl_root_fsolver_iterate(gsl_root_fsolver *s) {
  int ac_equal = 0;
  double a = s->a, b = s->b, c = s->c, d = s->d, e = s->e;
  double fa = s->fa, fb = s->fb, fc = s->fc;

  if ((fb < 0 && fc < 0) || (fb > 0 && fc > 0)) {
    ac_equal = 1;
    c = a;
    fc = fa;
    d = b - a;
    e = b - a;
  }
  if (std::fabs(fc) < std::fabs(fb)) {
    ac_equal = 1;
    a = b;
    b = c;
    c = a;
    fa = fb;
    fb = fc;
    fc = fa;
  }
  const double tol = 0.5 * GSL_DBL_EPSILON * std::fabs(b);
  const double m = 0.5 * (c - b);
  if (fb == 0.0 || std::fabs(m) <= tol) {
    s->root = b;
    s->x_lower = (b < c) ? b : c;
    s->x_upper = (b < c) ? c : b;
    s->a = a; s->b = b; s->c = c; s->d = d; s->e = e;
    s->fa = fa; s->fb = fb; s->fc = fc;
    return GSL_SUCCESS;
  }
  if (std::fabs(e) < tol || std::fabs(fa) <= std::fabs(fb)) {
    d = m;
    e = m;
  } else {
    double p, q, r;
    double sr = fb / fa;
    if (ac_equal) {
      p = 2 * m * sr;
      q = 1 - sr;
    } else {
      q = fa / fc;
      r = fb / fc;
      p = sr * (2 * m * q * (q - r) - (b - a) * (r - 1));
      q = (q - 1) * (r - 1) * (sr - 1);
    }
    if (p > 0)
      q = -q;
    else
      p = -p;
    const double lhs = 2 * p;
    const double rhs1 = 3 * m * q - std::fabs(tol * q);
    const double rhs2 = std::fabs(e * q);
    if (lhs < (rhs1 < rhs2 ? rhs1 : rhs2)) {
      e = d;
      d = p / q;
    } else {
      d = m;
      e = m;
    }
  }
  a = b;
  fa = fb;
  if (std::fabs(d) > tol)
    b += d;
  else
    b += (m > 0 ? tol : -tol);
  fb = GSL_FN_EVAL(s->function, b);

  s->a = a; s->b = b; s->c = c; s->d = d; s->e = e;
  s->fa = fa; s->fb = fb; s->fc = fc;
  s->root = b;
  if ((fb < 0 && fc < 0) || (fb > 0 && fc > 0)) {
    s->x_lower = (b < a) ? b : a;
    s->x_upper = (b < a) ? a : b;
  } else {
    s->x_lower = (b < c) ? b : c;
    s->x_upper = (b < c) ? c : b;
  }
  return GSL_SUCCESS;
}

static inline double gsl_root_fsolver_root(const gsl_root_fsolver *s) {
  return s->root;
}
static inline double gsl_root_fsolver_x_lower(const gsl_root_fsolver *s) {
  return s->x_lower;
}
static inline double gsl_root_fsolver_x_upper(const gsl_root_fsolver *s) {
  return s->x_upper;
}

/* ---- derivative (Newton) solver ---- */

typedef struct {
  const char *name;
} gsl_root_fdfsolver_type;

static const gsl_root_fdfsolver_type gsl_root_fdfsolver_newton_type = {
    "newton"};
#define gsl_root_fdfsolver_newton (&gsl_root_fdfsolver_newton_type)

typedef struct {
  const gsl_root_fdfsolver_type *type;
  gsl_function_fdf *fdf;
  double root;
  double f, df;
} gsl_root_fdfsolver;

static inline gsl_root_fdfsolver *
gsl_root_fdfsolver_alloc(const gsl_root_fdfsolver_type *T) {
  gsl_root_fdfsolver *s = (gsl_root_fdfsolver *)std::calloc(1, sizeof(*s));
  s->type = T;
  return s;
}

static inline void gsl_root_fdfsolver_free(gsl_root_fdfsolver *s) {
  std::free(s);
}

static inline const char *
gsl_root_fdfsolver_name(const gsl_root_fdfsolver *s) {
  return s->type->name;
}

static inline int gsl_root_fdfsolver_set(gsl_root_fdfsolver *s,
                                         gsl_function_fdf *fdf, double x) {
  s->fdf = fdf;
  s->root = x;
  GSL_FN_FDF_EVAL_F_DF(fdf, x, &s->f, &s->df);
  return GSL_SUCCESS;
}

static inline int gsl_root_fdfsolver_iterate(gsl_root_fdfsolver *s) {
  if (s->df == 0.0)
    return GSL_EZERODIV;
  if (!std::isfinite(s->f) || !std::isfinite(s->df))
    return GSL_EBADFUNC;
  s->root -= s->f / s->df;
  GSL_FN_FDF_EVAL_F_DF(s->fdf, s->root, &s->f, &s->df);
  return GSL_SUCCESS;
}

static inline double gsl_root_fdfsolver_root(const gsl_root_fdfsolver *s) {
  return s->root;
}

/* ---- convergence tests (GSL semantics) ---- */

static inline int gsl_root_test_interval(double lo, double hi, double epsabs,
                                         double epsrel) {
  const double abs_lo = std::fabs(lo), abs_hi = std::fabs(hi);
  double min_abs;
  if ((lo > 0.0 && hi > 0.0) || (lo < 0.0 && hi < 0.0))
    min_abs = (abs_lo < abs_hi) ? abs_lo : abs_hi;
  else
    min_abs = 0.0;
  const double tolerance = epsabs + epsrel * min_abs;
  return (std::fabs(hi - lo) < tolerance) ? GSL_SUCCESS : GSL_CONTINUE;
}

static inline int gsl_root_test_delta(double x1, double x0, double epsabs,
                                      double epsrel) {
  const double tolerance = epsabs + epsrel * std::fabs(x1);
  if (std::fabs(x1 - x0) < tolerance || x1 == x0)
    return GSL_SUCCESS;
  return GSL_CONTINUE;
}
