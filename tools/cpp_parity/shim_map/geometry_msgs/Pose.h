#pragma once
// geometry_msgs stubs (fields only; tools/cpp_parity map harness).
#include <ros/ros.h>

namespace geometry_msgs {

struct Point {
    double x = 0, y = 0, z = 0;
};

struct Point32 {
    float x = 0, y = 0, z = 0;
};

struct Vector3 {
    double x = 0, y = 0, z = 0;
};

struct Quaternion {
    double x = 0, y = 0, z = 0, w = 1;
};

struct Pose {
    Point position;
    Quaternion orientation;
};

struct PoseStamped {
    std_msgs::Header header;
    Pose pose;
};

struct PointStamped {
    std_msgs::Header header;
    Point point;
};

}  // namespace geometry_msgs
