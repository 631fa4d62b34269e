#!/bin/sh
# Build the native host-side data kernels -> native/liblcdata.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -fPIC -shared -std=c++17 \
    lcdata.cpp -o liblcdata.so
echo "built $(pwd)/liblcdata.so"
