#!/bin/sh
# Build libgnnome.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    gnnome_native.cpp -o libgnnome.so
echo "built $(pwd)/libgnnome.so"
