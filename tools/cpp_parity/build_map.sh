#!/bin/bash
# Builds libref_map.so: the UNMODIFIED reference ORCHESTRATOR
# (/root/reference/surfel_fusion/src/surfel_map.cpp — warp kernels, BFS,
# migration bookkeeping, msg sync) + CameraPoseVisualization + the kernel
# layer (fusion_functions.cpp), compiled against stub ROS/PCL headers
# (shim_map/), the Eigen shim (shim/) and system OpenCV, plus the extern
# "C" parity driver (map_driver.cpp).  Consumed by binding.py::RefSurfelMap
# and tests/test_cpp_parity.py.
set -e
cd "$(dirname "$0")"
REF=${REF_SRC:-/root/reference/surfel_fusion/src}
g++ -O2 -fPIC -shared -std=c++14 -pthread -w \
    -I shim_map -I shim -I "$REF" $(pkg-config --cflags opencv4) \
    map_driver.cpp "$REF/surfel_map.cpp" "$REF/CameraPoseVisualization.cpp" \
    "$REF/fusion_functions.cpp" \
    $(pkg-config --libs opencv4) \
    -o libref_map.so
echo "built $(pwd)/libref_map.so"
