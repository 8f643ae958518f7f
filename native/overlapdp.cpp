// Native exact banded overlap Viterbi fill.
//
// Host-side f64 engine for the overlap exact pass (the reference's
// QuaffOverlapViterbiMatrix fill, src/qoverlap.cpp:122-160), matching the
// semantics of the JAX engine in quaff_tpu/dp/overlap.py::overlap_fill:
// 3-state (M/I/D) banded recursion with max path choice, log-sum-exp
// merging of the degenerate insert/delete orderings inside the gap
// states, both-ends-free start/end, and an optional live-row window
// (j_off) for lane-packed envelope strips.
//
// The XLA engine evaluates the in-row delete recursion with an
// associative scan (tree-order rounding); this fill evaluates it
// sequentially, so cell values agree to ~1 ulp per log-sum-exp rather
// than bitwise.  Scores print at 6 significant digits and the traceback
// is argmax-based, so outputs are identical in practice; the golden
// tests pin this.
//
// Exposed via the plain C ABI at the bottom (ctypes: quaff_tpu/native.py).
// ctypes releases the GIL during calls, so Python-side thread pools give
// one fill per core.

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

#include "lse2.h"

namespace {

const double NEG_INF = -std::numeric_limits<double>::infinity();

using quaff_lse::lse2;  // shared softplus-table log-sum-exp (lse2.h)

static inline double max2(double a, double b) { return a > b ? a : b; }

}  // namespace

namespace {

// Fill one banded overlap Viterbi matrix.
//
// Band: lane w of row j holds cell (i, j) with i = d_lo + j + w; only
// lanes with member[w] != 0 are in the envelope.  Rows are local
// 1..n_rows with true row jt = j_off + j (y-side arrays are pre-sliced
// to the window: local index r reads the value at true position
// j_off + r).  x arrays are full length.
//
// STORE = true: outputs mat/ins/del are [n_rows+1, W] row-major with
// row 0 = -inf (the traceback's zero row).  STORE = false: [2, W]
// scratch rows, end score only (identical arithmetic & op order, so
// scores are bitwise equal).  *end_out gets the best end-cell score
// (add the full-sequence insert scores host-side for the final score).
template <bool STORE>
void overlap_fill_impl(
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
    double* mat, double* ins, double* del_, double* end_out) {
  // trans6[2] (i2d) only appears in the traceback, not the fill
  const double i2m = trans6[0], i2i = trans6[1];
  const double d2m = trans6[3], d2i = trans6[4], d2d = trans6[5];

  for (int64_t w = 0; w < W; ++w)
    mat[w] = ins[w] = del_[w] = NEG_INF;

  double end = NEG_INF;
  const int qq = x_has_qual && y_has_qual;
  const int xq_only = x_has_qual && !y_has_qual;
  const int yq_only = !x_has_qual && y_has_qual;

  // scratch rows for the vectorised passes (round 4): emission, pre-emit
  // match max, and the lse2 operand/result rows of the insert state
  std::vector<double> vrow(5 * W);
  double* const ex_row2 = vrow.data();
  double* const mm_row = ex_row2 + W;
  double* const A_row = mm_row + W;
  double* const B_row = A_row + W;
  double* const L_row = B_row + W;

  for (int64_t j = 1; j <= n_rows; ++j) {
    const int64_t rp = STORE ? (j - 1) : ((j - 1) & 1);
    const int64_t rc = STORE ? j : (j & 1);
    const double* __restrict mat_p = mat + rp * W;
    const double* __restrict ins_p = ins + rp * W;
    const double* __restrict del_p = del_ + rp * W;
    double* __restrict mat_c = mat + rc * W;
    double* __restrict ins_c = ins + rc * W;
    double* __restrict del_c = del_ + rc * W;

    const int64_t jt = j_off + j;
    if (jt > y_len) {
      for (int64_t w = 0; w < W; ++w)
        mat_c[w] = ins_c[w] = del_c[w] = NEG_INF;
      continue;
    }
    const int32_t ykm = y_mk[j - 1];
    const int32_t yqv = y_has_qual ? y_q[j - 1] : 0;
    const int32_t yik_j = y_ik_pad[j];
    const int32_t yik_jm1 = y_ik_pad[j - 1];
    // emission row slices for this y position
    const double* eq_row =
        qq ? pair_qq + ((int64_t)ykm * Q * Q + yqv) : nullptr;  // + xkm*Km*Q*Q + xq*Q
    const double* ex_row = xq_only ? pair_xq + (int64_t)ykm * Q : nullptr;
    const double* ey_row = yq_only ? pair_yq + ((int64_t)ykm * Q + yqv) : nullptr;
    const double* en_row = (!x_has_qual && !y_has_qual) ? pair_nn + ykm : nullptr;

    // lanes outside [w_min, w_max) have i-1 outside [0, x_len)
    int64_t w_min = -(d_lo + jt - 1);
    if (w_min < 0) w_min = 0;
    int64_t w_max = x_len - (d_lo + jt - 1);
    if (w_max > W) w_max = W;

    double del_prev = NEG_INF;  // in-row carry
    // W < 16: the one-pass scalar loop below beats the multi-pass
    // vector scaffolding (see qdp_overlap_viterbi_path's fill_row —
    // same cutoff, bitwise-equal cells either way)
    if (jt > 1 && W >= 16) {
      // Vectorised row (round 4): emission gather, pre-emit match max,
      // and the insert state's lse2 (quaff_lse::lse2_row) run as
      // lane-parallel passes with per-cell op sequences IDENTICAL to
      // the scalar loop below (bitwise-equal cells); the delete chain +
      // end pass stays sequential.  Row jt==1 keeps the scalar loop
      // (whole-row start clamp).
      const int64_t wlo = w_min < W ? (w_min > 0 ? w_min : 0) : W;
      const int64_t whi = w_max > 0 ? (w_max < W ? w_max : W) : 0;
      for (int64_t w = 0; w < wlo; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      for (int64_t w = whi; w < W; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      const int64_t xbase = d_lo + jt - 1;
      if (qq) {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          ex_row2[w] =
              eq_row[((int64_t)x_mk[xbase + w] * Km * Q + x_q[xbase + w]) *
                     Q];
      } else if (xq_only) {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          ex_row2[w] =
              ex_row[((int64_t)x_mk[xbase + w] * Km + 0) * Q +
                     x_q[xbase + w]];
      } else if (yq_only) {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          ex_row2[w] = ey_row[(int64_t)x_mk[xbase + w] * Km * Q];
      } else {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          ex_row2[w] = en_row[(int64_t)x_mk[xbase + w] * Km];
      }
      if (Ki == 1) {
        const double m2m0 = m2m[0];
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          mm_row[w] = max2(max2(mat_p[w] + m2m0, del_p[w] + d2m),
                           ins_p[w] + i2m);
      } else {
#pragma GCC ivdep
        for (int64_t w = wlo; w < whi; ++w)
          mm_row[w] = max2(
              max2(mat_p[w] +
                       m2m[(int64_t)x_ik_pad[xbase + w] * Ki + yik_jm1],
                   del_p[w] + d2m),
              ins_p[w] + i2m);
      }
      // idx == 0 start clamp applies to at most one lane, BEFORE emit
      const int64_t w0 = -xbase;
      if (w0 >= wlo && w0 < whi) mm_row[w0] = max2(mm_row[w0], 0.0);
#pragma GCC ivdep
      for (int64_t w = wlo; w < whi; ++w)
        mat_c[w] = member[w] ? mm_row[w] + ex_row2[w] : NEG_INF;
      // insert state: lse2(ins[w+1]+i2i, del[w+1]+d2i) vs mat[w+1]+m2i
      const int64_t wv1 = whi < W ? whi : W - 1;
#pragma GCC ivdep
      for (int64_t w = wlo; w < wv1; ++w) {
        A_row[w] = ins_p[w + 1] + i2i;
        B_row[w] = del_p[w + 1] + d2i;
      }
      for (int64_t w = wv1; w < whi; ++w) {  // last lane (no w+1)
        A_row[w] = NEG_INF + i2i;
        B_row[w] = NEG_INF + d2i;
      }
      if (whi > wlo) quaff_lse::lse2_row(A_row + wlo, B_row + wlo,
                                         L_row + wlo, whi - wlo);
      if (Ki == 1) {
        const double m2i0 = m2i[0];
#pragma GCC ivdep
        for (int64_t w = wlo; w < wv1; ++w) {
          const double ic = max2(L_row[w], mat_p[w + 1] + m2i0);
          ins_c[w] = member[w] ? ic : NEG_INF;
        }
        for (int64_t w = wv1; w < whi; ++w) {
          const double ic = max2(L_row[w], NEG_INF + m2i0);
          ins_c[w] = member[w] ? ic : NEG_INF;
        }
      } else {
        for (int64_t w = wlo; w < whi; ++w) {
          const double mp1 = (w + 1 < W) ? mat_p[w + 1] : NEG_INF;
          const double ic = max2(
              L_row[w],
              mp1 + m2i[(int64_t)x_ik_pad[xbase + w + 1] * Ki + yik_jm1]);
          ins_c[w] = member[w] ? ic : NEG_INF;
        }
      }
      // delete chain + end (sequential)
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
        if (jt == y_len || idx == x_len - 1) end = max2(end, mat_c[w]);
      }
      continue;
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

      // mat: sources (i-1, j-1) on the same lane of the previous row
      double m = max2(
          max2(mat_p[w] + m2m[(int64_t)xik_im1 * Ki + yik_jm1],
               del_p[w] + d2m),
          ins_p[w] + i2m);
      if (jt == 1 || idx == 0) m = max2(m, 0.0);  // both ends free
      m += emit;
      mat_c[w] = m;

      // ins: sources on lane w+1 of the previous row; D->I merged via lse
      double mp1 = (w + 1 < W) ? mat_p[w + 1] : NEG_INF;
      double ip1 = (w + 1 < W) ? ins_p[w + 1] : NEG_INF;
      double dp1 = (w + 1 < W) ? del_p[w + 1] : NEG_INF;
      double ic = max2(lse2(ip1 + i2i, dp1 + d2i),
                       mp1 + m2i[(int64_t)xik_i * Ki + yik_jm1]);
      ins_c[w] = ic;

      // del: in-row recursion over lanes w-1 -> w (I->D merged via lse)
      double k = (w > 0 ? ins_c[w - 1] : NEG_INF) + d2i;
      double b = (w > 0 ? mat_c[w - 1] : NEG_INF) +
                 m2d[(int64_t)xik_im1 * Ki + yik_j];
      double dc = max2(lse2(del_prev + d2d, k), b);
      del_c[w] = dc;
      del_prev = dc;

      // end: free at either sequence's end
      if (jt == y_len || idx == x_len - 1) end = max2(end, m);
    }
  }
  *end_out = end;
}

}  // namespace

extern "C" {

// Test hook: the fill's log-sum-exp, exported so the softplus-table
// accuracy has a direct regression test (tests/test_native.py) rather
// than only the end-to-end goldens.
double qdp_lse2(double a, double b) { return lse2(a, b); }

void qdp_overlap_fill(
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
    double* mat, double* ins, double* del_, double* end_out) {
  overlap_fill_impl<true>(
      x_mk, x_ik_pad, x_q, x_len, x_has_qual, y_mk, y_ik_pad, y_q, y_len,
      y_has_qual, j_off, n_rows, d_lo, W, member, pair_qq, pair_xq,
      pair_yq, pair_nn, Km, Q, m2m, m2i, m2d, Ki, trans6, mat, ins, del_,
      end_out);
}

// Score-only overlap fill: two scratch rows, end score only.
void qdp_overlap_score(
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
    double* end_out) {
  std::vector<double> buf(6 * W);
  overlap_fill_impl<false>(
      x_mk, x_ik_pad, x_q, x_len, x_has_qual, y_mk, y_ik_pad, y_q, y_len,
      y_has_qual, j_off, n_rows, d_lo, W, member, pair_qq, pair_xq,
      pair_yq, pair_nn, Km, Q, m2m, m2i, m2d, Ki, trans6, buf.data(),
      buf.data() + 2 * W, buf.data() + 4 * W, end_out);
}

}  // extern "C"

namespace {

// Fill one banded read-vs-ref DP matrix (the reference's QuaffDPMatrix
// fill, src/qmodel.cpp:1343-1560; JAX equivalent:
// quaff_tpu/dp/engine.py::dp_fill).  mode 0 = Viterbi (max combine),
// mode 1 = Forward (log-sum-exp combine).  local selects
// read-global/ref-local vs global start/end conditions.
//
// STORE = true: mat/ins/del are [n_rows+1, W] row-major outputs with
// row 0 = -inf.  STORE = false (score-only): mat/ins/del are [2, W]
// scratch rows — skips ~3*rows*W*8 bytes of stores and allocations when
// only the end score is needed (batch scoring).  Cell arithmetic is
// identical either way, and in Viterbi mode max is exactly associative,
// so score-only results are bitwise equal to the stored fill's.
template <bool STORE>
static void align_fill_impl(
    const int32_t* x_tok, int64_t x_len,
    const int32_t* y_tok, const int32_t* y_mk, const int32_t* y_ik_pad,
    const int32_t* y_q, int64_t y_len, int32_t y_has_qual,
    int64_t n_rows,
    int64_t d_lo, int64_t W, const uint8_t* member,
    const double* match_score, const double* match_score_noq,
    const double* insert_score, const double* insert_score_noq,
    int64_t Km, int64_t Q,
    const double* m2m, const double* m2i, const double* m2d,
    const double* m2e,
    double d2d, double d2m, double i2i, double i2m,
    int32_t mode, int32_t local,
    double* mat, double* ins, double* del_, double* end_out) {
  const bool fwd = mode != 0;
  auto comb = [fwd](double a, double b) {
    return fwd ? lse2(a, b) : max2(a, b);
  };

  for (int64_t w = 0; w < W; ++w)
    mat[w] = ins[w] = del_[w] = NEG_INF;

  std::vector<double> ex_buf(W);  // per-row emission scratch (Viterbi)
  double* const ex_row = ex_buf.data();
  double end = NEG_INF;
  for (int64_t j = 1; j <= n_rows; ++j) {
    const int64_t rp = STORE ? (j - 1) : ((j - 1) & 1);
    const int64_t rc = STORE ? j : (j & 1);
    const double* __restrict mat_p = mat + rp * W;
    const double* __restrict ins_p = ins + rp * W;
    const double* __restrict del_p = del_ + rp * W;
    double* __restrict mat_c = mat + rc * W;
    double* __restrict ins_c = ins + rc * W;
    double* __restrict del_c = del_ + rc * W;

    if (j > y_len) {
      for (int64_t w = 0; w < W; ++w)
        mat_c[w] = ins_c[w] = del_c[w] = NEG_INF;
      continue;
    }
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
    // forward end row accumulates lse across lanes XLA-style
    // (max + log sum exp(x - max)): gather contributions first
    double row_end_max = NEG_INF, row_end_sum = 0.0;
    if (!fwd && j > 1) {
      // Viterbi fast path (round 4): split each row into a lane-parallel
      // pass (mat + ins — every per-cell op sequence identical to the
      // scalar loop below, so values are BITWISE equal; lanes are
      // independent, so the compiler vectorises it) and the inherently
      // sequential delete-chain / end pass.  Row j=1 keeps the scalar
      // loop: its start clamp applies BEFORE the emission add.
      const int64_t wlo = w_min < W ? (w_min > 0 ? w_min : 0) : W;
      const int64_t whi = w_max > 0 ? (w_max < W ? w_max : W) : 0;
      for (int64_t w = 0; w < wlo; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      for (int64_t w = whi; w < W; ++w) mat_c[w] = ins_c[w] = NEG_INF;
      int64_t wv = (w_max == W) ? W - 1 : w_max;  // mp1/ip1 guard
      if (wv < w_min) wv = w_min;
      const int64_t xbase = d_lo + j - 1;
      // emission per lane as a vectorisable 4-way select (an indexed
      // load from the local mrow[] blocks the vectoriser)
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
        double iv = ins_emit + max2(ins_p[w + 1] + i2i, mat_p[w + 1] + m2i_j);
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
        if (j == y_len && (local || d_lo + j - 1 + w == x_len - 1))
          end = max2(end, mat_c[w] + m2e_j);
      }
    } else {
    for (int64_t w = 0; w < W; ++w) {
      if (w < w_min || w >= w_max || !member[w]) {
        mat_c[w] = ins_c[w] = del_c[w] = NEG_INF;
        del_prev = NEG_INF;
        continue;
      }
      const int64_t idx = d_lo + j - 1 + w;  // i-1

      double m = comb(comb(mat_p[w] + m2m_j, del_p[w] + d2m),
                      ins_p[w] + i2m);
      if (j == 1 && (local || idx == 0)) m = comb(m, 0.0);
      m += mrow[x_tok[idx]];
      mat_c[w] = m;

      double mp1 = (w + 1 < W) ? mat_p[w + 1] : NEG_INF;
      double ip1 = (w + 1 < W) ? ins_p[w + 1] : NEG_INF;
      ins_c[w] = ins_emit + comb(ip1 + i2i, mp1 + m2i_j);

      double b = (w > 0 ? mat_c[w - 1] : NEG_INF) + m2d_j;
      double dc = comb(del_prev + d2d, b);
      del_c[w] = dc;
      del_prev = dc;

      if (j == y_len && (local || idx == x_len - 1)) {
        double re = m + m2e_j;
        if (fwd) {
          if (re > row_end_max) {
            if (row_end_max != NEG_INF)
              row_end_sum = row_end_sum * std::exp(row_end_max - re) + 1.0;
            else
              row_end_sum = 1.0;
            row_end_max = re;
          } else if (re != NEG_INF) {
            row_end_sum += std::exp(re - row_end_max);
          }
        } else {
          end = max2(end, re);
        }
      }
    }
    }
    if (fwd && j == y_len && row_end_max != NEG_INF)
      end = lse2(end, row_end_max + std::log(row_end_sum));
  }
  *end_out = end;
}

}  // namespace

extern "C" {

void qdp_align_fill(
    const int32_t* x_tok, int64_t x_len,
    const int32_t* y_tok, const int32_t* y_mk, const int32_t* y_ik_pad,
    const int32_t* y_q, int64_t y_len, int32_t y_has_qual,
    int64_t n_rows,
    int64_t d_lo, int64_t W, const uint8_t* member,
    const double* match_score, const double* match_score_noq,
    const double* insert_score, const double* insert_score_noq,
    int64_t Km, int64_t Q,
    const double* m2m, const double* m2i, const double* m2d,
    const double* m2e,
    double d2d, double d2m, double i2i, double i2m,
    int32_t mode, int32_t local,
    double* mat, double* ins, double* del_, double* end_out) {
  align_fill_impl<true>(
      x_tok, x_len, y_tok, y_mk, y_ik_pad, y_q, y_len, y_has_qual, n_rows,
      d_lo, W, member, match_score, match_score_noq, insert_score,
      insert_score_noq, Km, Q, m2m, m2i, m2d, m2e, d2d, d2m, i2i, i2m,
      mode, local, mat, ins, del_, end_out);
}

// Score-only fill: same arguments minus the matrix outputs; allocates
// two scratch rows internally.
void qdp_align_score(
    const int32_t* x_tok, int64_t x_len,
    const int32_t* y_tok, const int32_t* y_mk, const int32_t* y_ik_pad,
    const int32_t* y_q, int64_t y_len, int32_t y_has_qual,
    int64_t n_rows,
    int64_t d_lo, int64_t W, const uint8_t* member,
    const double* match_score, const double* match_score_noq,
    const double* insert_score, const double* insert_score_noq,
    int64_t Km, int64_t Q,
    const double* m2m, const double* m2i, const double* m2d,
    const double* m2e,
    double d2d, double d2m, double i2i, double i2m,
    int32_t mode, int32_t local,
    double* end_out) {
  std::vector<double> buf(6 * W);
  align_fill_impl<false>(
      x_tok, x_len, y_tok, y_mk, y_ik_pad, y_q, y_len, y_has_qual, n_rows,
      d_lo, W, member, match_score, match_score_noq, insert_score,
      insert_score_noq, Km, Q, m2m, m2i, m2d, m2e, d2d, d2m, i2i, i2m,
      mode, local, buf.data(), buf.data() + 2 * W, buf.data() + 4 * W,
      end_out);
}

}  // extern "C"
