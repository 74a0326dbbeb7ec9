#!/bin/sh
# Build the native fastloader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    -o libfastloader.so fastloader.cpp
echo "built $(pwd)/libfastloader.so"
