#pragma once
// Minimal pcl::PointCloud stub (tools/cpp_parity map harness): just enough
// container API for the reference orchestrator's inactive_pointcloud
// bookkeeping (surfel_map.cpp:1456-1595, :681-748) — a thin std::vector
// wrapper, no PCL dependency.
#include <cstdint>
#include <memory>
#include <string>
#include <vector>

#include <ros/ros.h>

namespace pcl {

struct PCLHeader {
    std::uint64_t stamp = 0;
    std::string frame_id;
    std::uint32_t seq = 0;
};

struct PointXYZI {
    float x = 0, y = 0, z = 0, intensity = 0;
};

template <typename T>
struct PointCloud {
    typedef std::shared_ptr<PointCloud<T>> Ptr;
    typedef typename std::vector<T>::iterator iterator;
    typedef typename std::vector<T>::const_iterator const_iterator;

    PCLHeader header;
    std::vector<T> points;

    std::size_t size() const { return points.size(); }
    void reserve(std::size_t n) { points.reserve(n); }
    void push_back(const T &p) { points.push_back(p); }
    T &at(std::size_t i) { return points.at(i); }
    const T &at(std::size_t i) const { return points.at(i); }
    T &front() { return points.front(); }
    T &back() { return points.back(); }
    iterator begin() { return points.begin(); }
    iterator end() { return points.end(); }
    const_iterator begin() const { return points.begin(); }
    const_iterator end() const { return points.end(); }
    iterator erase(iterator a, iterator b) { return points.erase(a, b); }
    template <typename It>
    void insert(iterator pos, It a, It b) { points.insert(pos, a, b); }
    PointCloud &operator+=(const PointCloud &o) {
        points.insert(points.end(), o.points.begin(), o.points.end());
        return *this;
    }
};

}  // namespace pcl

namespace pcl_conversions {
inline void toPCL(const ros::Time &t, std::uint64_t &out) {
    out = (std::uint64_t)(t.toSec() * 1e6);
}
}  // namespace pcl_conversions
