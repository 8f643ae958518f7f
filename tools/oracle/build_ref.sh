#!/bin/sh
# Build the reference quaff binary as a debugging/benchmark oracle.
# Usage: tools/oracle/build_ref.sh [ref-dir] [out-binary]
# Validate with:
#   /tmp/quaffref/quaff align tests/data/synth12-genome.fasta \
#     tests/data/synth12.fastq -kmatchn 10 -nothreshold \
#     | diff - tests/data/synth12-align.oracle.stk
set -e
REF="${1:-/root/reference}"
OUT="${2:-/tmp/quaffref/quaff}"
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$(dirname "$OUT")"
g++ -std=c++11 -O2 -w -include cstring -DUSE_VECTOR_GUARDS \
  -I"$HERE/gslshim" -o "$OUT" "$REF/t/quaff.cpp" "$REF"/src/*.cpp -lz
echo "built $OUT"
