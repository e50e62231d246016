#pragma once
#include <string>
#include <vector>

#include <geometry_msgs/Pose.h>
#include <ros/ros.h>
#include <std_msgs/ColorRGBA.h>

namespace visualization_msgs {
struct Marker {
    enum {
        ARROW = 0,
        CUBE = 1,
        SPHERE = 2,
        CYLINDER = 3,
        LINE_STRIP = 4,
        LINE_LIST = 5,
        CUBE_LIST = 6,
        SPHERE_LIST = 7,
        POINTS = 8
    };
    enum { ADD = 0, MODIFY = 0, DELETE = 2 };

    std_msgs::Header header;
    std::string ns;
    int id = 0;
    int type = 0;
    int action = 0;
    geometry_msgs::Pose pose;
    geometry_msgs::Vector3 scale;
    std_msgs::ColorRGBA color;
    double lifetime = 0;
    bool frame_locked = false;
    std::vector<geometry_msgs::Point> points;
    std::vector<std_msgs::ColorRGBA> colors;
    std::string text;
};
}  // namespace visualization_msgs
