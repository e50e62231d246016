#pragma once
// pcl::io::savePCDFile stub: plain ascii x/y/z/intensity PCD writer so the
// reference's save_cloud (surfel_map.cpp:1153-1174) runs for file-level
// parity checks.
#include <cstdio>
#include <string>

#include <pcl_ros/point_cloud.h>

namespace pcl {
namespace io {

template <typename T>
inline int savePCDFile(const std::string &path, const PointCloud<T> &cloud) {
    FILE *f = std::fopen(path.c_str(), "w");
    if (!f) return -1;
    std::fprintf(f,
                 "# .PCD v0.7 - Point Cloud Data file format\n"
                 "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                 "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH %zu\nHEIGHT 1\n"
                 "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS %zu\nDATA ascii\n",
                 cloud.size(), cloud.size());
    for (const auto &p : cloud.points)
        std::fprintf(f, "%g %g %g %g\n", p.x, p.y, p.z, p.intensity);
    std::fclose(f);
    return 0;
}

}  // namespace io
}  // namespace pcl
