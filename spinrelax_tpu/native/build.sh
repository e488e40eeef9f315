#!/bin/bash
# Build the native fast-IO library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC fastio.cpp -o libfastio.so
echo "built $(pwd)/libfastio.so"
