#!/bin/bash
# Build the native data-plane shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    augment.cpp -o libuformer_augment.so
echo "built $(pwd)/libuformer_augment.so"
