#!/bin/bash
# Build the spoa differential harness against the reference checkout's
# ADAPTED spoa (kLOV/kROV + generate_consensus_custom).  The reference
# tree is read-only; sources compile straight out of it into /tmp.
#
# Usage: tools/build_spoa_harness.sh [REFERENCE_DIR] [OUT_DIR]
set -euo pipefail
REF=${1:-/root/reference}
OUT=${2:-/tmp/spoa_oracle}
HERE=$(cd "$(dirname "$0")" && pwd)
SPOA=$REF/external/spoa
mkdir -p "$OUT"
SRCS=$(ls "$SPOA"/src/*.cpp | grep -v main.cpp)  # main needs bioparser
g++ -O2 -std=c++14 -I"$SPOA/include" -I"$SPOA/src" \
    "$HERE/spoa_harness.cpp" $SRCS -o "$OUT/spoa_harness"
echo "built $OUT/spoa_harness"
