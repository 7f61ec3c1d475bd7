#!/bin/sh
# Build the native host-kernel library.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -o libmvlt_native.so mvlt_native.cc
echo "built native/libmvlt_native.so"
