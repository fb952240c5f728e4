#!/bin/bash
# Build the native runtime components into native/build/.
set -e
cd "$(dirname "$0")/.."
mkdir -p native/build
g++ -O3 -fPIC -shared -o native/build/libpansvr_bgzf.so \
    native/bgzf_codec.cpp -lz -lpthread
g++ -O3 -fPIC -shared -std=c++17 -pthread -o native/build/libpansvr_glue.so \
    native/engine_glue.cpp
echo "built native/build/libpansvr_bgzf.so libpansvr_glue.so"
