#!/bin/bash
# Build the native data-path library (JPEG decode/resize/normalize pipeline).
# Usage: bash scripts/build_native.sh
set -euo pipefail
cd "$(dirname "$0")/.."
SRC=orbit_tpu/data/_native/orbit_decoder.cpp
OUT=orbit_tpu/data/_native/liborbit_decoder.so
g++ -O3 -march=native -shared -fPIC -pthread -o "$OUT" "$SRC" -ljpeg
echo "built $OUT"
