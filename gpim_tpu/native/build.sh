#!/bin/sh
# Build the native spatial helper (_spatial.so). Pure C++17, no deps.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o _spatial.so spatial.cpp
echo "built $(pwd)/_spatial.so"
