#!/bin/sh
# Build the native chemops library. Called automatically on first use
# (cmdgen_tpu/chem/native.py); safe to run manually.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libchemops.so chemops.cpp
echo "built $(pwd)/libchemops.so"
