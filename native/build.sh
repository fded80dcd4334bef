#!/bin/sh
# Build the tpusky native support library (C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libtpusky_native.so tpusky_native.cpp
echo "built native/libtpusky_native.so"
