#!/bin/sh
# Build the native CSV parser (same flags as the on-first-use build in
# videoquery/index/_native_csv.py). The .so is never committed; a checkout
# without it falls back to the pure-Python parser until this runs.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread vqio.cc -o libvqio.so
echo "built $(pwd)/libvqio.so"
