#!/bin/sh
# Build the native runtime pieces into the package.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 framesink.cpp -lz -lpthread \
    -o ../pienerf_tpu/io/_framesink.so
echo "built pienerf_tpu/io/_framesink.so"
