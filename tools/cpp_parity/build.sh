#!/bin/bash
# Builds libref_fusion.so: the UNMODIFIED reference FusionFunctions kernels
# (/root/reference/surfel_fusion/src/fusion_functions.cpp) + the extern "C"
# parity driver, against the installed OpenCV, stub ROS headers, and the
# minimal Eigen shim.  Used by tools/cpp_parity/binding.py (auto-build) and
# tests/test_cpp_parity.py.
set -e
cd "$(dirname "$0")"
REF=${REF_SRC:-/root/reference/surfel_fusion/src}
g++ -O2 -fPIC -shared -std=c++14 -pthread -fopenmp -w \
    -I shim -I "$REF" $(pkg-config --cflags opencv4) \
    driver.cpp "$REF/fusion_functions.cpp" \
    $(pkg-config --libs opencv4) \
    -o libref_fusion.so
echo "built $(pwd)/libref_fusion.so"
