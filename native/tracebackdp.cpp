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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

#include "lse2.h"

namespace {
// Grow-only per-thread scratch for the path fills.  A fresh
// std::vector per call costs a ~4 MB malloc (mmap + munmap past the
// 128 KB threshold, serialized on the kernel's mmap lock across fill
// threads) plus zero-init and first-touch page faults EVERY call —
// measured as the all-vs-all exact pass pinning at ~2x of 4 cores.
// Arenas amortize all of that to the first (largest) call per thread.
inline double* tls_scratch(int slot, int64_t n) {
  thread_local std::vector<double> bufs[4];
  auto& b = bufs[slot];
  if ((int64_t)b.size() < n) b.resize(n);
  return b.data();
}
}  // namespace

namespace {

const double NEG_INF = -std::numeric_limits<double>::infinity();

using quaff_lse::lse2;  // shared softplus-table log-sum-exp (lse2.h)

static inline double max2(double a, double b) { return a > b ? a : b; }

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

// Checkpointed Viterbi fill + traceback in ONE call, per (pair, strip):
// the full-matrix winner fill writes 3*(R+1)*W doubles (~10 MB per
// full-length read) and is store-bandwidth-bound — measured 3x the cost
// of the score-only fill.  This routine instead stores every K-th row
// (plus 2 scratch rows) during the forward pass, then walks back
// through K-row windows refilled on demand from the checkpoints.  The
// window refill recomputes rows with the IDENTICAL per-row code and
// operand order as the forward pass, so every cell the traceback reads
// is bitwise equal to the full fill's — alignments are unchanged.
// Cost ~ 2 score-only fills; the working set (3*(K+1)*W doubles) stays
// L2-resident.  Viterbi + read-global modes only (the align pipeline's
// winner pass; qmodel.cpp:1562-1646 is the reference walk).
//
// Outputs as in qdp_viterbi_traceback, plus *score_out = the end score
// (bitwise equal to qdp_align_fill/qdp_align_score's).  Returns the
// column count, or -1 when no finite traceback source exists.
int64_t qdp_align_viterbi_path(
    const int32_t* x_tok, int64_t x_len,
    const int32_t* y_tok, const int32_t* y_mk, const int32_t* y_ik_pad,
    const int32_t* y_q, int64_t y_len, int32_t y_has_qual,
    int64_t d_lo, int64_t W, const uint8_t* member,
    const double* match_score, const double* match_score_noq,
    const double* insert_score, const double* insert_score_noq,
    int64_t Km, int64_t Q,
    const double* m2m, const double* m2i, const double* m2d,
    const double* m2e,
    double d2d, double d2m, double i2i, double i2m,
    int32_t local,
    double* score_out,
    int32_t* col_x, int32_t* col_y, int64_t* bounds) {
  const int64_t K = 64;  // checkpoint stride (window: 3*(K+1)*W doubles)

  // one row of the banded recursion: prev row (mat_p/ins_p/del_p) ->
  // cur row.  MUST stay expression-for-expression identical to
  // align_fill_impl's Viterbi branch (overlapdp.cpp) — qdp_align_score
  // and this routine must produce bitwise-equal cells.
  std::vector<double> ex_buf(W);  // per-row emission scratch
  double* const ex_row = ex_buf.data();
  auto fill_row = [&](int64_t j, const double* __restrict mat_p,
                      const double* __restrict ins_p,
                      const double* __restrict del_p,
                      double* __restrict mat_c, double* __restrict ins_c,
                      double* __restrict del_c, double* end) {
    const int32_t ik_prev = y_ik_pad[j - 1];
    const int32_t ik_cur = y_ik_pad[j];
    const double m2m_j = m2m[ik_prev];
    const double m2i_j = m2i[ik_prev];
    const double m2d_j = m2d[ik_cur];
    const double m2e_j = m2e[ik_cur];

    const int32_t ykm = y_mk[j - 1];
    const int32_t yqv = y_has_qual ? y_q[j - 1] : 0;
    const int32_t yt = y_tok[j - 1];
    double mrow[4];
    for (int r = 0; r < 4; ++r)
      mrow[r] = y_has_qual
                    ? match_score[((int64_t)r * Km + ykm) * Q + yqv]
                    : match_score_noq[(int64_t)r * Km + ykm];
    const double ins_emit = y_has_qual
                                ? insert_score[(int64_t)yt * Q + yqv]
                                : insert_score_noq[yt];

    int64_t w_min = -(d_lo + j - 1);
    if (w_min < 0) w_min = 0;
    int64_t w_max = x_len - (d_lo + j - 1);
    if (w_max > W) w_max = W;

    double del_prev = NEG_INF;
    if (j > 1) {
      // lane-parallel mat+ins pass then the sequential delete/end pass;
      // per-cell op sequences identical to the scalar loop below, so
      // values are BITWISE equal (round-4 vectorisation — mirrors
      // align_fill_impl's Viterbi fast path in overlapdp.cpp)
      const int64_t wlo = w_min < W ? (w_min > 0 ? w_min : 0) : W;
      const int64_t whi = w_max > 0 ? (w_max < W ? w_max : W) : 0;
      for (int64_t w = 0; w < wlo; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      for (int64_t w = whi; w < W; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      int64_t wv = (w_max == W) ? W - 1 : w_max;
      if (wv < w_min) wv = w_min;
      const int64_t xbase = d_lo + j - 1;
      const double mr0 = mrow[0], mr1 = mrow[1], mr2 = mrow[2],
                   mr3 = mrow[3];
#pragma GCC ivdep
      for (int64_t w = w_min; w < wv; ++w) {
        const int32_t t = x_tok[xbase + w];
        ex_row[w] = t == 0 ? mr0 : (t == 1 ? mr1 : (t == 2 ? mr2 : mr3));
      }
#pragma GCC ivdep
      for (int64_t w = w_min; w < wv; ++w) {
        double m = max2(max2(mat_p[w] + m2m_j, del_p[w] + d2m),
                        ins_p[w] + i2m);
        m += ex_row[w];
        double iv =
            ins_emit + max2(ins_p[w + 1] + i2i, mat_p[w + 1] + m2i_j);
        mat_c[w] = member[w] ? m : NEG_INF;
        ins_c[w] = member[w] ? iv : NEG_INF;
      }
      for (int64_t w = wv; w < w_max; ++w) {  // last lane (no w+1)
        if (!member[w]) {
          mat_c[w] = ins_c[w] = NEG_INF;
          continue;
        }
        double m = max2(max2(mat_p[w] + m2m_j, del_p[w] + d2m),
                        ins_p[w] + i2m);
        m += mrow[x_tok[xbase + w]];
        mat_c[w] = m;
        ins_c[w] = ins_emit + max2(NEG_INF + i2i, NEG_INF + m2i_j);
      }
      for (int64_t w = 0; w < W; ++w) {
        if (w < w_min || w >= w_max || !member[w]) {
          del_c[w] = NEG_INF;
          del_prev = NEG_INF;
          continue;
        }
        double b = (w > 0 ? mat_c[w - 1] : NEG_INF) + m2d_j;
        double dc = max2(del_prev + d2d, b);
        del_c[w] = dc;
        del_prev = dc;
        if (end && j == y_len && (local || xbase + w == x_len - 1))
          *end = max2(*end, mat_c[w] + m2e_j);
      }
      return;
    }
    for (int64_t w = 0; w < W; ++w) {
      if (w < w_min || w >= w_max || !member[w]) {
        mat_c[w] = ins_c[w] = del_c[w] = NEG_INF;
        del_prev = NEG_INF;
        continue;
      }
      const int64_t idx = d_lo + j - 1 + w;  // i-1

      double m = max2(max2(mat_p[w] + m2m_j, del_p[w] + d2m),
                      ins_p[w] + i2m);
      if (j == 1 && (local || idx == 0)) m = max2(m, 0.0);
      m += mrow[x_tok[idx]];
      mat_c[w] = m;

      double mp1 = (w + 1 < W) ? mat_p[w + 1] : NEG_INF;
      double ip1 = (w + 1 < W) ? ins_p[w + 1] : NEG_INF;
      ins_c[w] = ins_emit + max2(ip1 + i2i, mp1 + m2i_j);

      double b = (w > 0 ? mat_c[w - 1] : NEG_INF) + m2d_j;
      double dc = max2(del_prev + d2d, b);
      del_c[w] = dc;
      del_prev = dc;

      if (end && j == y_len && (local || idx == x_len - 1))
        *end = max2(*end, m + m2e_j);
    }
  };

  // forward pass: 2 scratch rows, checkpoints at rows 0, K, 2K, ...
  const int64_t n_ckpt = y_len / K + 1;
  std::vector<double> ck(3 * n_ckpt * W);
  double* ck_mat = ck.data();
  double* ck_ins = ck_mat + n_ckpt * W;
  double* ck_del = ck_ins + n_ckpt * W;
  std::vector<double> scratch(6 * W);
  double* s_mat = scratch.data();
  double* s_ins = s_mat + 2 * W;
  double* s_del = s_ins + 2 * W;
  for (int64_t w = 0; w < W; ++w)
    s_mat[w] = s_ins[w] = s_del[w] = NEG_INF;
  std::memcpy(ck_mat, s_mat, W * sizeof(double));
  std::memcpy(ck_ins, s_ins, W * sizeof(double));
  std::memcpy(ck_del, s_del, W * sizeof(double));

  double end = NEG_INF;
  for (int64_t j = 1; j <= y_len; ++j) {
    const int64_t rp = (j - 1) & 1, rc = j & 1;
    fill_row(j, s_mat + rp * W, s_ins + rp * W, s_del + rp * W,
             s_mat + rc * W, s_ins + rc * W, s_del + rc * W, &end);
    if (j % K == 0) {
      const int64_t c = j / K;
      std::memcpy(ck_mat + c * W, s_mat + rc * W, W * sizeof(double));
      std::memcpy(ck_ins + c * W, s_ins + rc * W, W * sizeof(double));
      std::memcpy(ck_del + c * W, s_del + rc * W, W * sizeof(double));
    }
  }
  *score_out = end;

  // traceback window: rows base .. base+K (row 0 of the window is the
  // checkpoint row); refilled on demand as the walk descends
  std::vector<double> win(3 * (K + 1) * W);
  double* w_mat = win.data();
  double* w_ins = w_mat + (K + 1) * W;
  double* w_del = w_ins + (K + 1) * W;
  int64_t base = -1;

  auto ensure = [&](int64_t j) {
    if (base >= 0 && j >= base && j <= base + K) return;
    base = j > 0 ? ((j - 1) / K) * K : 0;
    const int64_t c = base / K;
    std::memcpy(w_mat, ck_mat + c * W, W * sizeof(double));
    std::memcpy(w_ins, ck_ins + c * W, W * sizeof(double));
    std::memcpy(w_del, ck_del + c * W, W * sizeof(double));
    const int64_t top = std::min(base + K, y_len);
    for (int64_t r = base + 1; r <= top; ++r) {
      const int64_t o = r - base;
      fill_row(r, w_mat + (o - 1) * W, w_ins + (o - 1) * W,
               w_del + (o - 1) * W, w_mat + o * W, w_ins + o * W,
               w_del + o * W, nullptr);
    }
  };

  auto cell = [&](const double* arr, int64_t i, int64_t j) {
    if (j < 0 || j > y_len || i < 0 || i > x_len) return NEG_INF;
    const int64_t w = i - j - d_lo;
    if (w < 0 || w >= W) return NEG_INF;
    return arr[(j - base) * W + w];
  };
  auto m = [&](int64_t i, int64_t j) { return cell(w_mat, i, j); };
  auto I = [&](int64_t i, int64_t j) { return cell(w_ins, i, j); };
  auto D = [&](int64_t i, int64_t j) { return cell(w_del, i, j); };

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

  // end column choice — identical to qdp_viterbi_traceback
  ensure(y_len);
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
      ensure(j >= 0 ? j : 0);
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
      ensure(j >= 0 ? j : 0);
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

// Checkpointed overlap Viterbi fill + traceback in ONE call, per
// (pair, strip) — the overlap analogue of qdp_align_viterbi_path: the
// exact pass's full-matrix fills (3*(R+1)*W doubles per strip) are
// store-bandwidth-bound; this stores every K-th row during a
// two-scratch-row forward pass, then walks back through K-row windows
// refilled from the checkpoints with the IDENTICAL per-row code and
// operand order as qdp_overlap_fill (overlapdp.cpp), so every cell the
// traceback reads is bitwise equal to the full fill's.
//
// Unlike qdp_overlap_fill, y-side arrays are FULL-length (indexed at
// true row jt = j_off + r); slicing in the batched fill reads the same
// values, so cells agree bitwise.  The walk replicates
// qdp_overlap_traceback below (strict-greater candidate order,
// ins/del-run squashing, qoverlap.cpp:162-290).
//
// *end_out = best end-cell score (add the full-sequence insert scores
// host-side, as for qdp_overlap_score).  Returns the column count,
// -2 when no finite end cell exists (no alignment — not an error), or
// -1 when a finite end has no finite traceback source (a real bug).
int64_t qdp_overlap_viterbi_path(
    const int32_t* x_mk, const int32_t* x_ik_pad, const int32_t* x_q,
    int64_t x_len, int32_t x_has_qual,
    const int32_t* y_mk, const int32_t* y_ik_pad, const int32_t* y_q,
    int64_t y_len, int32_t y_has_qual,
    int64_t j_off, int64_t n_rows,
    int64_t d_lo, int64_t W, const uint8_t* member,
    const double* pair_qq, const double* pair_xq, const double* pair_yq,
    const double* pair_nn, int64_t Km, int64_t Q,
    const double* m2m, const double* m2i, const double* m2d, int64_t Ki,
    const double* trans6,
    double* end_out,
    int32_t* col_x, int32_t* col_y, int64_t* bounds) {
  const int64_t K = 64;  // checkpoint stride (window: 3*(K+1)*W doubles)
  const double i2m = trans6[0], i2i = trans6[1], i2d = trans6[2];
  const double d2m = trans6[3], d2i = trans6[4], d2d = trans6[5];
  const int qq = x_has_qual && y_has_qual;
  const int xq_only = x_has_qual && !y_has_qual;
  const int yq_only = !x_has_qual && y_has_qual;

  // one local row r (true row jt = j_off + r) of the banded recursion —
  // MUST stay expression-for-expression identical to overlap_fill_impl
  // (overlapdp.cpp), with y arrays indexed at the true row.
  double* const vbuf = tls_scratch(0, 5 * W);  // vector-pass scratch rows
  double* const vex = vbuf;
  double* const vmm = vex + W;
  double* const vA = vmm + W;
  double* const vB = vA + W;
  double* const vL = vB + W;
  auto fill_row = [&](int64_t r, const double* __restrict mat_p,
                      const double* __restrict ins_p,
                      const double* __restrict del_p,
                      double* __restrict mat_c, double* __restrict ins_c,
                      double* __restrict del_c, double* end) {
    const int64_t jt = j_off + r;
    if (jt > y_len) {
      for (int64_t w = 0; w < W; ++w)
        mat_c[w] = ins_c[w] = del_c[w] = NEG_INF;
      return;
    }
    const int32_t ykm = y_mk[jt - 1];
    const int32_t yqv = y_has_qual ? y_q[jt - 1] : 0;
    const int32_t yik_j = y_ik_pad[jt];
    const int32_t yik_jm1 = y_ik_pad[jt - 1];
    const double* eq_row =
        qq ? pair_qq + ((int64_t)ykm * Q * Q + yqv) : nullptr;
    const double* ex_row = xq_only ? pair_xq + (int64_t)ykm * Q : nullptr;
    const double* ey_row =
        yq_only ? pair_yq + ((int64_t)ykm * Q + yqv) : nullptr;
    const double* en_row =
        (!x_has_qual && !y_has_qual) ? pair_nn + ykm : nullptr;

    int64_t w_min = -(d_lo + jt - 1);
    if (w_min < 0) w_min = 0;
    int64_t w_max = x_len - (d_lo + jt - 1);
    if (w_max > W) w_max = W;

    double del_prev = NEG_INF;
    // Narrow strips (W < 16, e.g. the 3-wide diagonal-0 winner of a
    // non-overlapping pair — 2/3 of all-vs-all path fills) take the
    // one-pass scalar loop below: the vector path's ~6 separate row
    // passes + lse2_row call are pure per-row overhead at 3 lanes
    // (measured ~2x the whole fill).  Cells are bitwise equal either
    // way (the vector path replicates the scalar op order).
    if (jt > 1 && W >= 16) {
      // vectorised row (round 4): mirrors overlap_fill_impl's fast path
      // (overlapdp.cpp) — emission gather, pre-emit match max and the
      // insert state's lse2_row as lane-parallel passes with per-cell
      // op sequences identical to the scalar loop (bitwise equal);
      // delete chain + end stay sequential
      const int64_t wlo = w_min < W ? (w_min > 0 ? w_min : 0) : W;
      const int64_t whi = w_max > 0 ? (w_max < W ? w_max : W) : 0;
      for (int64_t w = 0; w < wlo; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      for (int64_t w = whi; w < W; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      const int64_t xbase = d_lo + jt - 1;
      if (qq) {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          vex[w] =
              eq_row[((int64_t)x_mk[xbase + w] * Km * Q + x_q[xbase + w]) *
                     Q];
      } else if (xq_only) {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          vex[w] =
              ex_row[((int64_t)x_mk[xbase + w] * Km + 0) * Q +
                     x_q[xbase + w]];
      } else if (yq_only) {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          vex[w] = ey_row[(int64_t)x_mk[xbase + w] * Km * Q];
      } else {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          vex[w] = en_row[(int64_t)x_mk[xbase + w] * Km];
      }
      if (Ki == 1) {
        const double m2m0 = m2m[0];
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          vmm[w] = max2(max2(mat_p[w] + m2m0, del_p[w] + d2m),
                        ins_p[w] + i2m);
      } else {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          vmm[w] = max2(
              max2(mat_p[w] +
                       m2m[(int64_t)x_ik_pad[xbase + w] * Ki + yik_jm1],
                   del_p[w] + d2m),
              ins_p[w] + i2m);
      }
      const int64_t w0 = -xbase;  // idx == 0 start clamp (one lane)
      if (w0 >= wlo && w0 < whi) vmm[w0] = max2(vmm[w0], 0.0);
#pragma GCC ivdep
      for (int64_t w = wlo; w < whi; ++w)
        mat_c[w] = member[w] ? vmm[w] + vex[w] : NEG_INF;
      const int64_t wv1 = whi < W ? whi : W - 1;
#pragma GCC ivdep
      for (int64_t w = wlo; w < wv1; ++w) {
        vA[w] = ins_p[w + 1] + i2i;
        vB[w] = del_p[w + 1] + d2i;
      }
      for (int64_t w = wv1; w < whi; ++w) {
        vA[w] = NEG_INF + i2i;
        vB[w] = NEG_INF + d2i;
      }
      if (whi > wlo)
        quaff_lse::lse2_row(vA + wlo, vB + wlo, vL + wlo, whi - wlo);
      if (Ki == 1) {
        const double m2i0 = m2i[0];
#pragma GCC ivdep
        for (int64_t w = wlo; w < wv1; ++w) {
          const double ic = max2(vL[w], mat_p[w + 1] + m2i0);
          ins_c[w] = member[w] ? ic : NEG_INF;
        }
        for (int64_t w = wv1; w < whi; ++w) {
          const double ic = max2(vL[w], NEG_INF + m2i0);
          ins_c[w] = member[w] ? ic : NEG_INF;
        }
      } else {
        for (int64_t w = wlo; w < whi; ++w) {
          const double mp1 = (w + 1 < W) ? mat_p[w + 1] : NEG_INF;
          const double ic = max2(
              vL[w],
              mp1 + m2i[(int64_t)x_ik_pad[xbase + w + 1] * Ki + yik_jm1]);
          ins_c[w] = member[w] ? ic : NEG_INF;
        }
      }
      for (int64_t w = 0; w < W; ++w) {
        if (w < w_min || w >= w_max || !member[w]) {
          del_c[w] = NEG_INF;
          del_prev = NEG_INF;
          continue;
        }
        const int64_t idx = xbase + w;
        double k = (w > 0 ? ins_c[w - 1] : NEG_INF) + d2i;
        double b = (w > 0 ? mat_c[w - 1] : NEG_INF) +
                   m2d[(int64_t)x_ik_pad[idx] * Ki + yik_j];
        double dc = max2(lse2(del_prev + d2d, k), b);
        del_c[w] = dc;
        del_prev = dc;
        if (end && (jt == y_len || idx == x_len - 1))
          *end = max2(*end, mat_c[w]);
      }
      return;
    }
    for (int64_t w = 0; w < W; ++w) {
      if (w < w_min || w >= w_max || !member[w]) {
        mat_c[w] = ins_c[w] = del_c[w] = NEG_INF;
        del_prev = NEG_INF;
        continue;
      }
      const int64_t idx = d_lo + jt - 1 + w;  // i-1
      const int32_t xkm = x_mk[idx];
      const int32_t xik_im1 = x_ik_pad[idx];
      const int32_t xik_i = x_ik_pad[idx + 1];

      double emit;
      if (qq)
        emit = eq_row[((int64_t)xkm * Km * Q + x_q[idx]) * Q];
      else if (xq_only)
        emit = ex_row[((int64_t)xkm * Km + 0) * Q + x_q[idx]];
      else if (yq_only)
        emit = ey_row[(int64_t)xkm * Km * Q];
      else
        emit = en_row[(int64_t)xkm * Km];

      double m = max2(
          max2(mat_p[w] + m2m[(int64_t)xik_im1 * Ki + yik_jm1],
               del_p[w] + d2m),
          ins_p[w] + i2m);
      if (jt == 1 || idx == 0) m = max2(m, 0.0);  // both ends free
      m += emit;
      mat_c[w] = m;

      double mp1 = (w + 1 < W) ? mat_p[w + 1] : NEG_INF;
      double ip1 = (w + 1 < W) ? ins_p[w + 1] : NEG_INF;
      double dp1 = (w + 1 < W) ? del_p[w + 1] : NEG_INF;
      double ic = max2(lse2(ip1 + i2i, dp1 + d2i),
                       mp1 + m2i[(int64_t)xik_i * Ki + yik_jm1]);
      ins_c[w] = ic;

      double k = (w > 0 ? ins_c[w - 1] : NEG_INF) + d2i;
      double b = (w > 0 ? mat_c[w - 1] : NEG_INF) +
                 m2d[(int64_t)xik_im1 * Ki + yik_j];
      double dc = max2(lse2(del_prev + d2d, k), b);
      del_c[w] = dc;
      del_prev = dc;

      if (end && (jt == y_len || idx == x_len - 1)) *end = max2(*end, m);
    }
  };

  // Small strips (the all-vs-all overlap common case: tens of lanes)
  // store the full matrix during the forward pass — it stays cache-
  // resident, and the walk then needs ZERO window refills (saves one
  // full fill pass).  Large strips keep the checkpointed scheme.  Cell
  // values are bitwise identical either way (same fill_row, same order).
  // QUAFF_OV_FULLSTORE_CAP (bytes) tunes the stored-matrix ceiling:
  // full-store trades ~1.28x less compute for 3*(rows+1)*W*8 bytes of
  // store traffic per fill — with several fill threads sharing one
  // DRAM interface the checkpointed scheme (2 scratch rows + 66 KB of
  // checkpoints, near-zero store traffic) can win despite the refills.
  static const int64_t kFullStoreCap = [] {
    const char* s = std::getenv("QUAFF_OV_FULLSTORE_CAP");
    return s ? (int64_t)std::atoll(s) : (int64_t)(4 << 20);
  }();
  const bool full_store = 3 * (n_rows + 1) * W * 8 <= kFullStoreCap;
  const int64_t Keff = full_store ? n_rows : K;

  // forward pass: checkpoints at local rows 0, K, 2K... (full_store:
  // the "window" buffer below doubles as the whole matrix)
  const int64_t n_ckpt = full_store ? 1 : n_rows / K + 1;
  // (full_store: ck is unused but ck_ins/ck_del pointer offsets below
  // must stay in-bounds, so still reserve 3*W)
  double* ck_mat = tls_scratch(1, 3 * n_ckpt * W);
  double* ck_ins = ck_mat + n_ckpt * W;
  double* ck_del = ck_ins + n_ckpt * W;
  double* w_mat = tls_scratch(2, 3 * (Keff + 1) * W);
  double* w_ins = w_mat + (Keff + 1) * W;
  double* w_del = w_ins + (Keff + 1) * W;
  double* scratch = tls_scratch(3, full_store ? 1 : 6 * W);
  double* s_mat = full_store ? w_mat : scratch;
  double* s_ins = full_store ? w_ins : scratch + 2 * W;
  double* s_del = full_store ? w_del : scratch + 4 * W;
  for (int64_t w = 0; w < W; ++w)
    s_mat[w] = s_ins[w] = s_del[w] = NEG_INF;
  if (!full_store) {
    std::memcpy(ck_mat, s_mat, W * sizeof(double));
    std::memcpy(ck_ins, s_ins, W * sizeof(double));
    std::memcpy(ck_del, s_del, W * sizeof(double));
  }

  double end = NEG_INF;
  for (int64_t r = 1; r <= n_rows; ++r) {
    const int64_t rp = full_store ? (r - 1) : ((r - 1) & 1);
    const int64_t rc = full_store ? r : (r & 1);
    fill_row(r, s_mat + rp * W, s_ins + rp * W, s_del + rp * W,
             s_mat + rc * W, s_ins + rc * W, s_del + rc * W, &end);
    if (!full_store && r % K == 0) {
      const int64_t c = r / K;
      std::memcpy(ck_mat + c * W, s_mat + rc * W, W * sizeof(double));
      std::memcpy(ck_ins + c * W, s_ins + rc * W, W * sizeof(double));
      std::memcpy(ck_del + c * W, s_del + rc * W, W * sizeof(double));
    }
  }
  *end_out = end;
  if (end == NEG_INF) return -2;  // no finite end cell: no alignment

  // traceback window over local rows base .. base+Keff
  int64_t base = full_store ? 0 : -1;

  auto ensure = [&](int64_t r) {
    if (full_store) return;  // whole matrix already resident
    if (r < 0) r = 0;
    if (r > n_rows) r = n_rows;
    if (base >= 0 && r >= base && r <= base + Keff) return;
    base = r > 0 ? ((r - 1) / K) * K : 0;
    const int64_t c = base / K;
    std::memcpy(w_mat, ck_mat + c * W, W * sizeof(double));
    std::memcpy(w_ins, ck_ins + c * W, W * sizeof(double));
    std::memcpy(w_del, ck_del + c * W, W * sizeof(double));
    const int64_t top = std::min(base + K, n_rows);
    for (int64_t rr = base + 1; rr <= top; ++rr) {
      const int64_t o = rr - base;
      fill_row(rr, w_mat + (o - 1) * W, w_ins + (o - 1) * W,
               w_del + (o - 1) * W, w_mat + o * W, w_ins + o * W,
               w_del + o * W, nullptr);
    }
  };

  // banded window accessor with the Cells bounds semantics (row r must
  // already be inside the ensured window when finite)
  auto cell = [&](const double* arr, int64_t i, int64_t j) {
    if (j < 0 || j > y_len || i < 0 || i > x_len) return NEG_INF;
    const int64_t w = i - j - d_lo;
    if (w < 0 || w >= W) return NEG_INF;
    const int64_t r = j - j_off;
    if (r < 0 || r > n_rows) return NEG_INF;
    return arr[(r - base) * W + w];
  };
  auto m = [&](int64_t i, int64_t j) { return cell(w_mat, i, j); };
  auto I = [&](int64_t i, int64_t j) { return cell(w_ins, i, j); };
  auto D = [&](int64_t i, int64_t j) { return cell(w_del, i, j); };

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
  // — identical scan order to qdp_overlap_traceback; rows outside the
  // strip's live window read -inf without touching the window buffer
  int64_t x_end = x_len, y_end = y_len;
  auto scan_cell = [&](int64_t i, int64_t j) {
    if (j < 0 || j > y_len || i < 0 || i > x_len) return NEG_INF;
    const int64_t w = i - j - d_lo;
    if (w < 0 || w >= W) return NEG_INF;
    const int64_t r = j - j_off;
    if (r < 0 || r > n_rows) return NEG_INF;
    ensure(r);
    return w_mat[(r - base) * W + w];
  };
  double best = scan_cell(x_len, y_len);
  for (int64_t i_end = x_len; i_end >= 1; --i_end) {
    double sc = scan_cell(i_end, y_len);
    if (sc > best) {
      best = sc;
      x_end = i_end;
      y_end = y_len;
    }
  }
  for (int64_t j_end = y_len; j_end >= 1; --j_end) {
    double sc = scan_cell(x_len, j_end);
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
  std::vector<int32_t> ins_run, del_run;
  ins_run.reserve(64);
  del_run.reserve(64);

  ensure(y_end - j_off);
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
      ensure(j - j_off);
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
      ensure(j - j_off);
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

// Batched driver for qdp_overlap_viterbi_path: one FFI crossing per
// task SLICE instead of per task.  The per-call ctypes marshalling
// (~30 argument conversions) plus the GIL reacquisition convoy after
// every native return measurably halved 4-thread exact-pass scaling
// (T=4 ran 2.3x serial, while 4 GIL-free processes ran 3.9x); with the
// loop in C the workers hold the GIL only to assemble the pointer
// tables below.  Parallel per-task arrays:
//   xyptr  [n][7]: x_mk, x_ik_pad, x_q, y_mk, y_ik_pad, y_q, member
//   geom   [n][6]: x_len, y_len, j_off, n_rows, d_lo, W
//   hasq   [n][2]: x_has_qual, y_has_qual
//   tabptr [n][8]: pair_qq, pair_xq, pair_yq, pair_nn, m2m, m2i, m2d,
//                  trans6
//   tabdim [n][3]: Km, Q, Ki
//   colptr [n][2]: col_x, col_y output buffers (cap = x_len + y_len)
//   end_out[n], bounds[n][4], ret[n] (the per-task return value)
void qdp_overlap_viterbi_path_batch(
    int64_t n_tasks, const uint64_t* xyptr, const int64_t* geom,
    const int32_t* hasq, const uint64_t* tabptr, const int64_t* tabdim,
    const uint64_t* colptr, double* end_out, int64_t* bounds,
    int64_t* ret) {
  for (int64_t t = 0; t < n_tasks; ++t) {
    const uint64_t* xp = xyptr + t * 7;
    const int64_t* g = geom + t * 6;
    const uint64_t* tp = tabptr + t * 8;
    const int64_t* td = tabdim + t * 3;
    ret[t] = qdp_overlap_viterbi_path(
        (const int32_t*)xp[0], (const int32_t*)xp[1],
        (const int32_t*)xp[2], g[0], hasq[t * 2],
        (const int32_t*)xp[3], (const int32_t*)xp[4],
        (const int32_t*)xp[5], g[1], hasq[t * 2 + 1],
        g[2], g[3], g[4], g[5], (const uint8_t*)xp[6],
        (const double*)tp[0], (const double*)tp[1],
        (const double*)tp[2], (const double*)tp[3], td[0], td[1],
        (const double*)tp[4], (const double*)tp[5],
        (const double*)tp[6], td[2], (const double*)tp[7],
        end_out + t, (int32_t*)colptr[t * 2],
        (int32_t*)colptr[t * 2 + 1], bounds + t * 4);
  }
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
