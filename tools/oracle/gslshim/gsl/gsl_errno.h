/* Minimal GSL error-code shim for building the reference quaff binary
 * as a debugging/benchmark oracle (see tools/oracle/build_ref.sh).
 * Only the codes and macros the reference sources touch. */
#pragma once

#define GSL_SUCCESS 0
#define GSL_FAILURE (-1)
#define GSL_CONTINUE (-2)
#define GSL_EDOM 1
#define GSL_ERANGE 2
#define GSL_EINVAL 4
#define GSL_EBADFUNC 9
#define GSL_EZERODIV 12
#define GSL_ERUNAWAY 30

/* the reference uses GSL_ERROR only in int-returning fit functions */
#define GSL_ERROR(reason, gsl_errno) do { return (gsl_errno); } while (0)
