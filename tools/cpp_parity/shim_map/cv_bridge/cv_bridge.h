#pragma once
// cv_bridge stub: the parity driver feeds cv::Mat frames into the private
// buffers directly, so toCvCopy only needs to COMPILE (image_input /
// depth_input are never exercised).  Calling it aborts loudly.
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <string>

#include <opencv2/opencv.hpp>
#include <ros/ros.h>
#include <sensor_msgs/Image.h>

namespace cv_bridge {

struct CvImage {
    std_msgs::Header header;
    std::string encoding;
    cv::Mat image;
};
typedef std::shared_ptr<CvImage> CvImagePtr;

inline CvImagePtr toCvCopy(const sensor_msgs::ImageConstPtr &,
                           const std::string &) {
    std::fprintf(stderr,
                 "cv_bridge::toCvCopy is not implemented in the parity "
                 "harness (feed frames via sm_feed_frame)\n");
    std::abort();
}

}  // namespace cv_bridge
