#!/bin/sh
# Build the native runtime components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -shared -fPIC bvh_builder.cpp -o lib/libbvh_builder.so
echo "built native/lib/libbvh_builder.so"
