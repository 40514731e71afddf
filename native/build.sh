#!/bin/sh
# Build the native data-pipeline library (pyramid kernels + graph utilities).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    src/diffreg_native.cpp src/diffreg_graph.cpp \
    -o libdiffreg_native.so
echo "built native/libdiffreg_native.so"
