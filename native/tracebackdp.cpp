// Native Viterbi tracebacks over host-filled banded DP matrices.
//
// Replicates the Python walks in quaff_tpu/dp/traceback.py (read-vs-ref,
// QuaffViterbiMatrix::alignment src/qmodel.cpp:1562-1646) and
// quaff_tpu/overlap.py::overlap_traceback (QuaffOverlapViterbiMatrix::
// alignment, src/qoverlap.cpp:162-290) including the reference's
// strict-greater candidate order (Match > Insert > Delete > Start) and
// the overlap path's squashing of adjacent insert/delete runs into
// aligned columns.  All float arithmetic uses the same f64 association
// order as the Python expressions, so chosen paths are identical.
//
// Output format: per-column character indices col_x/col_y (0-based into
// the respective sequence, -1 = gap), written right-to-left into the
// caller's capacity-(x_len+y_len) buffers; the return value is the
// number of columns (the caller reads the LAST n columns), or -1 when
// no finite traceback source exists.

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

const double NEG_INF = -std::numeric_limits<double>::infinity();

enum State { MATCH = 0, INSERT = 1, DELETE = 2, START = 3 };

// banded cell accessor with the Python _Cells bounds semantics
struct Cells {
  const double* arr;  // [n_rows + 1, W]
  int64_t n_rows, W, d_lo, row_off, x_len, y_len;
  double operator()(int64_t i, int64_t j) const {
    if (j < 0 || j > y_len || i < 0 || i > x_len) return NEG_INF;
    int64_t w = i - j - d_lo;
    if (w < 0 || w >= W) return NEG_INF;
    int64_t r = j - row_off;
    if (r < 0 || r > n_rows) return NEG_INF;
    return arr[r * W + w];
  }
};

}  // namespace

extern "C" {

// Read-vs-ref traceback (x = ref, y = read).  bounds out: {x_start,
// x_end} (1-based).  Tables as in qdp_align_fill.
int64_t qdp_viterbi_traceback(
    const int32_t* x_tok, int64_t x_len,
    const int32_t* y_tok, const int32_t* y_mk, const int32_t* y_ik_pad,
    const int32_t* y_q, int64_t y_len, int32_t y_has_qual,
    int64_t n_rows, int64_t d_lo, int64_t W,
    const double* match_score, const double* match_score_noq,
    const double* insert_score, const double* insert_score_noq,
    int64_t Km, int64_t Q,
    const double* m2m, const double* m2i, const double* m2d,
    const double* m2e,
    double d2d, double d2m, double i2i, double i2m,
    int32_t local,
    const double* mat, const double* ins, const double* del_,
    int32_t* col_x, int32_t* col_y, int64_t* bounds) {
  Cells m{mat, n_rows, W, d_lo, 0, x_len, y_len};
  Cells I{ins, n_rows, W, d_lo, 0, x_len, y_len};
  Cells D{del_, n_rows, W, d_lo, 0, x_len, y_len};

  auto match_emit = [&](int64_t i, int64_t j) {
    if (y_has_qual)
      return match_score[((int64_t)x_tok[i - 1] * Km + y_mk[j - 1]) * Q +
                         y_q[j - 1]];
    return match_score_noq[(int64_t)x_tok[i - 1] * Km + y_mk[j - 1]];
  };
  auto insert_emit = [&](int64_t j) {
    if (y_has_qual)
      return insert_score[(int64_t)y_tok[j - 1] * Q + y_q[j - 1]];
    return insert_score_noq[y_tok[j - 1]];
  };

  // end column choice (strict >, scanning i_end descending; the first
  // iteration pins best at i_end == x_len — qmodel.cpp:1564-1575)
  int64_t x_end = x_len;
  if (local) {
    double best = NEG_INF;
    for (int64_t i_end = x_len; i_end >= 1; --i_end) {
      double sc = m(i_end, y_len) + m2e[y_ik_pad[y_len]];
      if (i_end == x_len || sc > best) {
        best = sc;
        x_end = i_end;
      }
    }
  }

  int64_t i = x_end, j = y_len;
  const int64_t cap = x_len + y_len;
  int64_t pos = cap;
  int state = MATCH;

  while (state != START) {
    double cand[4];
    int cst[4];
    int nc = 0;
    if (state == MATCH) {
      double emit = match_emit(i, j);
      --i;
      --j;
      --pos;
      col_x[pos] = (int32_t)i;
      col_y[pos] = (int32_t)j;
      cand[nc] = m(i, j) + m2m[y_ik_pad[j]] + emit;
      cst[nc++] = MATCH;
      cand[nc] = I(i, j) + i2m + emit;
      cst[nc++] = INSERT;
      cand[nc] = D(i, j) + d2m + emit;
      cst[nc++] = DELETE;
      if (j == 0 && (i == 0 || local)) {
        cand[nc] = emit;
        cst[nc++] = START;
      }
    } else if (state == INSERT) {
      double emit = insert_emit(j);
      --j;
      --pos;
      col_x[pos] = -1;
      col_y[pos] = (int32_t)j;
      cand[nc] = m(i, j) + m2i[y_ik_pad[j]] + emit;
      cst[nc++] = MATCH;
      cand[nc] = I(i, j) + i2i + emit;
      cst[nc++] = INSERT;
    } else {  // DELETE
      --i;
      --pos;
      col_x[pos] = (int32_t)i;
      col_y[pos] = -1;
      cand[nc] = m(i, j) + m2d[y_ik_pad[j]];
      cst[nc++] = MATCH;
      cand[nc] = D(i, j) + d2d;
      cst[nc++] = DELETE;
    }
    double src = NEG_INF;
    int next = -1;
    for (int c = 0; c < nc; ++c)
      if (cand[c] > src) {
        src = cand[c];
        next = cst[c];
      }
    if (next < 0) return -1;
    state = next;
  }
  bounds[0] = i + 1;  // x_start
  bounds[1] = x_end;
  return cap - pos;
}

// Read-vs-read overlap traceback with ins/del-run squashing.  Tables as
// in qdp_overlap_fill; trans6 = {i2m, i2i, i2d, d2m, d2i, d2d} effective
// values.  bounds out: {x_start, x_end, y_start, y_end} (1-based).
int64_t qdp_overlap_traceback(
    const int32_t* x_mk, const int32_t* x_ik_pad, const int32_t* x_q,
    int64_t x_len, int32_t x_has_qual,
    const int32_t* y_mk, const int32_t* y_ik_pad, const int32_t* y_q,
    int64_t y_len, int32_t y_has_qual,
    int64_t row_off, int64_t n_rows,
    int64_t d_lo, int64_t W,
    const double* pair_qq, const double* pair_xq, const double* pair_yq,
    const double* pair_nn, int64_t Km, int64_t Q,
    const double* m2m, const double* m2i, const double* m2d, int64_t Ki,
    const double* trans6,
    const double* mat, const double* ins, const double* del_,
    int32_t* col_x, int32_t* col_y, int64_t* bounds) {
  const double i2m = trans6[0], i2i = trans6[1], i2d = trans6[2];
  const double d2m = trans6[3], d2i = trans6[4], d2d = trans6[5];
  Cells m{mat, n_rows, W, d_lo, row_off, x_len, y_len};
  Cells I{ins, n_rows, W, d_lo, row_off, x_len, y_len};
  Cells D{del_, n_rows, W, d_lo, row_off, x_len, y_len};

  const int qq = x_has_qual && y_has_qual;
  const int xq_only = x_has_qual && !y_has_qual;
  const int yq_only = !x_has_qual && y_has_qual;
  auto match_emit = [&](int64_t i, int64_t j) {
    const int64_t xi = x_mk[i - 1], yj = y_mk[j - 1];
    if (qq)
      return pair_qq[(((xi * Km + yj) * Q) + x_q[i - 1]) * Q + y_q[j - 1]];
    if (xq_only) return pair_xq[(xi * Km + yj) * Q + x_q[i - 1]];
    if (yq_only) return pair_yq[(xi * Km + yj) * Q + y_q[j - 1]];
    return pair_nn[xi * Km + yj];
  };
  auto t_m2m = [&](int64_t i, int64_t j) {
    return m2m[(int64_t)x_ik_pad[i] * Ki + y_ik_pad[j]];
  };
  auto t_m2i = [&](int64_t i, int64_t j) {
    return m2i[(int64_t)x_ik_pad[i] * Ki + y_ik_pad[j]];
  };
  auto t_m2d = [&](int64_t i, int64_t j) {
    return m2d[(int64_t)x_ik_pad[i] * Ki + y_ik_pad[j]];
  };

  // end cell: best over last row then last column (qoverlap.cpp:164-182)
  int64_t x_end = x_len, y_end = y_len;
  double best = m(x_len, y_len);
  for (int64_t i_end = x_len; i_end >= 1; --i_end) {
    double sc = m(i_end, y_len);
    if (sc > best) {
      best = sc;
      x_end = i_end;
      y_end = y_len;
    }
  }
  for (int64_t j_end = y_len; j_end >= 1; --j_end) {
    double sc = m(x_len, j_end);
    if (sc > best) {
      best = sc;
      x_end = x_len;
      y_end = j_end;
    }
  }

  int64_t i = x_end, j = y_end;
  const int64_t cap = x_len + y_len;
  int64_t pos = cap;
  int state = MATCH;
  // pending gap runs in collection (right-to-left) order
  std::vector<int32_t> ins_run, del_run;
  ins_run.reserve(64);
  del_run.reserve(64);

  while (state != START) {
    double cand[4];
    int cst[4];
    int nc = 0;
    if (state == MATCH) {
      double emit = match_emit(i, j);
      --i;
      --j;
      --pos;
      col_x[pos] = (int32_t)i;
      col_y[pos] = (int32_t)j;
      cand[nc] = m(i, j) + t_m2m(i, j) + emit;
      cst[nc++] = MATCH;
      cand[nc] = I(i, j) + i2m + emit;
      cst[nc++] = INSERT;
      cand[nc] = D(i, j) + d2m + emit;
      cst[nc++] = DELETE;
      if (j == 0 || i == 0) {
        cand[nc] = emit;
        cst[nc++] = START;
      }
    } else if (state == INSERT) {
      --j;
      ins_run.push_back((int32_t)j);
      cand[nc] = m(i, j) + t_m2i(i, j);
      cst[nc++] = MATCH;
      cand[nc] = I(i, j) + i2i;
      cst[nc++] = INSERT;
      cand[nc] = D(i, j) + d2i;
      cst[nc++] = DELETE;
    } else {  // DELETE
      --i;
      del_run.push_back((int32_t)i);
      cand[nc] = m(i, j) + t_m2d(i, j);
      cst[nc++] = MATCH;
      cand[nc] = I(i, j) + i2d;
      cst[nc++] = INSERT;
      cand[nc] = D(i, j) + d2d;
      cst[nc++] = DELETE;
    }
    double src = NEG_INF;
    int next = -1;
    for (int c = 0; c < nc; ++c)
      if (cand[c] > src) {
        src = cand[c];
        next = cst[c];
      }
    if (next < 0) return -1;
    state = next;

    if (state == MATCH && (!ins_run.empty() || !del_run.empty())) {
      // squash adjacent insert/delete runs (qoverlap.cpp:231-267):
      // left-to-right the group reads [shared pairs][x-over-gap extras]
      // [gap-over-y extras]; emitted here right-to-left
      const int64_t ni = (int64_t)ins_run.size();
      const int64_t nd = (int64_t)del_run.size();
      const int64_t shared = ni < nd ? ni : nd;
      const int64_t extra_i = ni - shared, extra_d = nd - shared;
      for (int64_t t = 0; t < extra_i; ++t) {
        --pos;
        col_x[pos] = -1;
        col_y[pos] = ins_run[t];
      }
      for (int64_t t = 0; t < extra_d; ++t) {
        --pos;
        col_x[pos] = del_run[t];
        col_y[pos] = -1;
      }
      for (int64_t s = 0; s < shared; ++s) {
        --pos;
        col_x[pos] = del_run[extra_d + s];
        col_y[pos] = ins_run[extra_i + s];
      }
      ins_run.clear();
      del_run.clear();
    }
  }
  bounds[0] = i + 1;
  bounds[1] = x_end;
  bounds[2] = j + 1;
  bounds[3] = y_end;
  return cap - pos;
}

}  // extern "C"
