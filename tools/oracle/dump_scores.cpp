// Dump the reference QuaffScores tables at full (hex) precision for
// ulp-level parity debugging against quaff_tpu.dp.scores.ScoreTables.
//
// Build (mirrors build_ref.sh):
//   g++ -std=c++11 -O2 -w -include cstring -I tools/oracle/gslshim \
//     -o /tmp/quaffref/dump_scores tools/oracle/dump_scores.cpp \
//     /root/reference/src/*.cpp -lz
// Usage: dump_scores params.json            (or "-" for default params)
//
// Output: one line per value, "<key> <hexfloat>".
#include <cstdio>
#include <fstream>
#include <sstream>
#include "../../../reference/src/qmodel.h"
#include "../../../reference/src/defaultparams.h"

int main(int argc, char** argv) {
  QuaffParams qp;
  if (argc > 1 && std::string(argv[1]) != "-") {
    std::ifstream in(argv[1]);
    qp.readJson(in);
  } else {
    qp = defaultQuaffParams();
  }
  QuaffScores qs(qp);
  const size_t Km = qs.matchContext.numKmers;
  const size_t Ki = qs.indelContext.numKmers;
  for (size_t i = 0; i < dnaAlphabetSize; ++i)
    for (size_t j = 0; j < Km; ++j) {
      printf("matchnoq %zu %zu %a\n", i, j, qs.match[i][j].logSymProb);
      for (int q = 0; q < (int)FastSeq::qualScoreRange; ++q)
        printf("match %zu %zu %d %a\n", i, j, q,
               qs.match[i][j].logSymQualProb[q]);
    }
  for (size_t i = 0; i < dnaAlphabetSize; ++i) {
    printf("insnoq %zu %a\n", i, qs.insert[i].logSymProb);
    for (int q = 0; q < (int)FastSeq::qualScoreRange; ++q)
      printf("ins %zu %d %a\n", i, q, qs.insert[i].logSymQualProb[q]);
  }
  for (size_t j = 0; j < Ki; ++j) {
    printf("m2m %zu %a\n", j, qs.m2m[j]);
    printf("m2i %zu %a\n", j, qs.m2i[j]);
    printf("m2d %zu %a\n", j, qs.m2d[j]);
    printf("m2e %zu %a\n", j, qs.m2e[j]);
  }
  printf("d2d %a\nd2m %a\ni2i %a\ni2m %a\n", qs.d2d, qs.d2m, qs.i2i, qs.i2m);
  return 0;
}
