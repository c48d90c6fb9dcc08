#!/bin/sh
# Build the native data-path library -> native/libpackbatch.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fopenmp -shared -fPIC \
    native/packbatch.cpp -o native/libpackbatch.so
echo "built native/libpackbatch.so"
