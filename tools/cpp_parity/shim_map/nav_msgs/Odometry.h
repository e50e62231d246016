#pragma once
#include <memory>
#include <string>

#include <geometry_msgs/Pose.h>
#include <ros/ros.h>

namespace geometry_msgs {
struct PoseWithCovariance {
    Pose pose;
    double covariance[36] = {0};
};
}  // namespace geometry_msgs

namespace nav_msgs {
struct Odometry {
    std_msgs::Header header;
    std::string child_frame_id;
    geometry_msgs::PoseWithCovariance pose;
};
typedef std::shared_ptr<const Odometry> OdometryConstPtr;
}  // namespace nav_msgs
