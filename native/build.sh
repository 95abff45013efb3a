#!/bin/sh
# Build the native helpers into shared libraries next to this script.
set -e
cd "$(dirname "$0")"
g++ -std=c++17 -O2 -fPIC -shared -o libppm_encoder.so ppm_encoder.cc
echo "built: $(pwd)/libppm_encoder.so"
