#!/bin/sh
# Build libmbots_host.so (the native host data plane).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    mbots_host.cpp -o libmbots_host.so
echo "built $(pwd)/libmbots_host.so"
