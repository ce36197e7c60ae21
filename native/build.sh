#!/bin/bash
# Build the native host-runtime library.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    src/sgtpu_native.cc -o lib/libsgtpu_native.so
echo "built lib/libsgtpu_native.so"
