#!/bin/sh
# Build the native csyx codec shared library.
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
g++ -O3 -fPIC -shared -o native/build/libcsyx.so native/csyx.cc
echo "built native/build/libcsyx.so"
