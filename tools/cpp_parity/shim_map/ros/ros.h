#pragma once
// Clean-room ROS API stub for compiling the UNMODIFIED reference
// orchestrator (/root/reference/surfel_fusion/src/surfel_map.cpp) without a
// ROS installation (tools/cpp_parity map harness).  Publishers are no-ops;
// NodeHandle parameters come from a process-global store the parity driver
// fills before constructing SurfelMap.
#include <fstream>   // the reference sources use std::ofstream/std::cout
#include <iostream>  // without including these (real ROS headers pull
                     // them in transitively)
#include <map>
#include <memory>
#include <string>

namespace ros {

struct Time {
    double t = 0.0;
    Time() {}
    explicit Time(double s) : t(s) {}
    double toSec() const { return t; }
    bool operator==(const Time &o) const { return t == o.t; }
    bool operator<(const Time &o) const { return t < o.t; }
};

class Publisher {
public:
    template <typename T>
    void publish(const T &) const {}
    template <typename T>
    void publish(const std::shared_ptr<T> &) const {}
};

namespace stub {
inline std::map<std::string, double> &params() {
    static std::map<std::string, double> p;
    return p;
}
}  // namespace stub

class NodeHandle {
public:
    bool getParam(const std::string &k, int &out) const {
        auto it = stub::params().find(k);
        if (it == stub::params().end()) return false;
        out = (int)it->second;
        return true;
    }
    bool getParam(const std::string &k, float &out) const {
        auto it = stub::params().find(k);
        if (it == stub::params().end()) return false;
        out = (float)it->second;
        return true;
    }
    bool getParam(const std::string &k, double &out) const {
        auto it = stub::params().find(k);
        if (it == stub::params().end()) return false;
        out = it->second;
        return true;
    }
    bool getParam(const std::string &, std::string &) const { return false; }
    bool getParam(const std::string &k, bool &out) const {
        auto it = stub::params().find(k);
        if (it == stub::params().end()) return false;
        out = it->second != 0.0;
        return true;
    }

    template <typename T>
    Publisher advertise(const std::string &, int) {
        return Publisher();
    }
};

}  // namespace ros

namespace std_msgs {
struct Header {
    unsigned seq = 0;
    ros::Time stamp;
    std::string frame_id;
};
}  // namespace std_msgs
