#!/bin/sh
# Build the native SPC builder shared library (no pybind11 — plain C ABI via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libwisp_spc.so spc_builder.cpp
echo "built $(pwd)/libwisp_spc.so"
