#!/bin/sh
# Build the native runtime library. Called automatically on first import of
# lichtfeld_studio_tpu.io.native (cached after that).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread -o liblfs_native.so lfs_native.cpp
echo "built $(pwd)/liblfs_native.so"
