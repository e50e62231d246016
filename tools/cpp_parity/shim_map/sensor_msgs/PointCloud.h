#pragma once
#include <memory>
#include <string>
#include <vector>

#include <geometry_msgs/Pose.h>
#include <ros/ros.h>

namespace sensor_msgs {
struct ChannelFloat32 {
    std::string name;
    std::vector<float> values;
};
struct PointCloud {
    std_msgs::Header header;
    std::vector<geometry_msgs::Point32> points;
    std::vector<ChannelFloat32> channels;
};
typedef std::shared_ptr<const PointCloud> PointCloudConstPtr;
}  // namespace sensor_msgs
