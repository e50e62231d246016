// Orchestrator parity driver: compiles the UNMODIFIED reference
// orchestrator (/root/reference/surfel_fusion/src/surfel_map.cpp — warp
// kernels :681-824, BFS :1643-1674, migration bookkeeping :1456-1595, sync
// :103-203, pose/loop ingestion :205-365) together with the reference
// kernel layer (fusion_functions.cpp) against stub ROS/PCL headers
// (shim_map/) and the Eigen shim, exposing a flat extern "C" API consumed
// by tools/cpp_parity/binding.py::RefSurfelMap.
//
// Same test-only access hack as driver.cpp: `private` -> `public` for the
// reference headers only (data-member access resolves at compile time;
// the GCC/Itanium ABI keeps declaration-order layout for this class shape).
#include <Eigen/Eigen>
#include <opencv2/opencv.hpp>
#include <cstring>
#include <memory>
#include <vector>

#define private public
#include "surfel_map.h"
#undef private

namespace {

geometry_msgs::Pose pose_from7(const double *p7) {
    // p7 = [px, py, pz, qx, qy, qz, qw]
    geometry_msgs::Pose p;
    p.position.x = p7[0];
    p.position.y = p7[1];
    p.position.z = p7[2];
    p.orientation.x = p7[3];
    p.orientation.y = p7[4];
    p.orientation.z = p7[5];
    p.orientation.w = p7[6];
    return p;
}

void pose_to7(const geometry_msgs::Pose &p, double *p7) {
    p7[0] = p.position.x;
    p7[1] = p.position.y;
    p7[2] = p.position.z;
    p7[3] = p.orientation.x;
    p7[4] = p.orientation.y;
    p7[5] = p.orientation.z;
    p7[6] = p.orientation.w;
}

struct MapHolder {
    ros::NodeHandle nh;
    SurfelMap map;
    MapHolder() : map(nh) {}
};

}  // namespace

extern "C" {

void sm_set_param(const char *name, double value) {
    ros::stub::params()[name] = value;
}

void *sm_create() { return new MapHolder(); }

void sm_destroy(void *p) { delete (MapHolder *)p; }

// One reference-schema pose message (orb_results_input,
// surfel_map.cpp:205-365): current pose + keyframe flag (covariance[0]) +
// reference index (covariance[1]) + full loop path + loop-edge pairs.
void sm_orb_input(void *p, double stamp, const double *pose7, int is_kf,
                  int ref_index, const double *path7, int n_path,
                  const float *pairs, int n_pairs) {
    SurfelMap &m = ((MapHolder *)p)->map;

    auto odom = std::make_shared<nav_msgs::Odometry>();
    odom->header.stamp = ros::Time(stamp);
    odom->pose.pose = pose_from7(pose7);
    odom->pose.covariance[0] = is_kf ? 1.0 : -1.0;
    odom->pose.covariance[1] = (double)ref_index;

    auto path = std::make_shared<nav_msgs::Path>();
    path->header.stamp = ros::Time(stamp);
    path->poses.resize(n_path);
    for (int i = 0; i < n_path; i++)
        path->poses[i].pose = pose_from7(path7 + 7 * i);

    auto loops = std::make_shared<sensor_msgs::PointCloud>();
    loops->header.stamp = ros::Time(stamp);
    loops->channels.resize(1);
    for (int i = 0; i < 2 * n_pairs; i++)
        loops->channels[0].values.push_back(pairs[i]);

    m.orb_results_input(loops, path, odom);
}

// Push one frame into the private buffers (bypassing cv_bridge) and run the
// exact-stamp synchronizer (surfel_map.cpp:83-203).
void sm_feed_frame(void *p, double stamp, const unsigned char *image,
                   const float *depth) {
    SurfelMap &m = ((MapHolder *)p)->map;
    cv::Mat img(m.cam_height, m.cam_width, CV_8UC1);
    std::memcpy(img.data, image, (size_t)m.cam_height * m.cam_width);
    cv::Mat dep(m.cam_height, m.cam_width, CV_32FC1);
    std::memcpy(dep.data, depth,
                (size_t)m.cam_height * m.cam_width * sizeof(float));
    m.image_buffer.push_back(std::make_pair(ros::Time(stamp), img));
    m.depth_buffer.push_back(std::make_pair(ros::Time(stamp), dep));
    m.synchronize_msgs();
}

int sm_n_poses(void *p) {
    return (int)((MapHolder *)p)->map.poses_database.size();
}

// info4 = [points_begin_index, points_pose_index, n_attached, n_linked]
void sm_pose_info(void *p, int i, double *cam7, double *loop7, int *info4) {
    PoseElement &pe = ((MapHolder *)p)->map.poses_database[i];
    pose_to7(pe.cam_pose, cam7);
    pose_to7(pe.loop_pose, loop7);
    info4[0] = pe.points_begin_index;
    info4[1] = pe.points_pose_index;
    info4[2] = (int)pe.attached_surfels.size();
    info4[3] = (int)pe.linked_pose_index.size();
}

void sm_get_linked(void *p, int i, int *out) {
    PoseElement &pe = ((MapHolder *)p)->map.poses_database[i];
    for (size_t k = 0; k < pe.linked_pose_index.size(); k++)
        out[k] = pe.linked_pose_index[k];
}

void sm_get_attached(void *p, int i, SurfelElement *out) {
    PoseElement &pe = ((MapHolder *)p)->map.poses_database[i];
    if (!pe.attached_surfels.empty())
        std::memcpy(out, pe.attached_surfels.data(),
                    pe.attached_surfels.size() * sizeof(SurfelElement));
}

int sm_n_local(void *p) {
    return (int)((MapHolder *)p)->map.local_surfels.size();
}

void sm_get_local(void *p, SurfelElement *out) {
    SurfelMap &m = ((MapHolder *)p)->map;
    if (!m.local_surfels.empty())
        std::memcpy(out, m.local_surfels.data(),
                    m.local_surfels.size() * sizeof(SurfelElement));
}

int sm_local_indexs(void *p, int *out, int max) {
    SurfelMap &m = ((MapHolder *)p)->map;
    int n = 0;
    for (int idx : m.local_surfels_indexs)
        if (n < max) out[n++] = idx;
    return (int)m.local_surfels_indexs.size();
}

int sm_inactive_size(void *p) {
    return (int)((MapHolder *)p)->map.inactive_pointcloud->size();
}

void sm_get_inactive(void *p, float *xyzi) {
    SurfelMap &m = ((MapHolder *)p)->map;
    for (size_t i = 0; i < m.inactive_pointcloud->size(); i++) {
        const pcl::PointXYZI &pt = m.inactive_pointcloud->at(i);
        xyzi[4 * i + 0] = pt.x;
        xyzi[4 * i + 1] = pt.y;
        xyzi[4 * i + 2] = pt.z;
        xyzi[4 * i + 3] = pt.intensity;
    }
}

int sm_pointcloud_pose_index(void *p, int *out, int max) {
    SurfelMap &m = ((MapHolder *)p)->map;
    int n = (int)m.pointcloud_pose_index.size();
    for (int i = 0; i < n && i < max; i++) out[i] = m.pointcloud_pose_index[i];
    return n;
}

// The reference BFS itself (get_driftfree_poses, surfel_map.cpp:1643-1674).
int sm_driftfree(void *p, int root, int range, int *out, int max) {
    SurfelMap &m = ((MapHolder *)p)->map;
    std::vector<int> res;
    m.get_driftfree_poses(root, res, range);
    for (int i = 0; i < (int)res.size() && i < max; i++) out[i] = res[i];
    return (int)res.size();
}

// --- direct state injection (focused warp/BFS tests; bypasses fusion) ---

void sm_inject_pose(void *p, const double *cam7, const double *loop7,
                    const int *linked, int n_linked,
                    const SurfelElement *attached, int n_att, int in_local) {
    SurfelMap &m = ((MapHolder *)p)->map;
    PoseElement pe;
    pe.cam_pose = pose_from7(cam7);
    pe.loop_pose = pose_from7(loop7);
    for (int i = 0; i < n_linked; i++)
        pe.linked_pose_index.push_back(linked[i]);
    int index = (int)m.poses_database.size();
    if (n_att > 0) {
        pe.points_begin_index = (int)m.inactive_pointcloud->size();
        pe.points_pose_index = (int)m.pointcloud_pose_index.size();
        m.pointcloud_pose_index.push_back(index);
        pe.attached_surfels.assign(attached, attached + n_att);
        for (int i = 0; i < n_att; i++) {
            pcl::PointXYZI pt;
            pt.x = attached[i].px;
            pt.y = attached[i].py;
            pt.z = attached[i].pz;
            pt.intensity = attached[i].color;
            m.inactive_pointcloud->push_back(pt);
        }
    }
    m.poses_database.push_back(pe);
    if (in_local) m.local_surfels_indexs.insert(index);
}

void sm_set_local_surfels(void *p, const SurfelElement *s, int n) {
    SurfelMap &m = ((MapHolder *)p)->map;
    m.local_surfels.assign(s, s + n);
}

void sm_set_loop_pose(void *p, int i, const double *loop7) {
    ((MapHolder *)p)->map.poses_database[i].loop_pose = pose_from7(loop7);
}

// The reference warp dispatcher itself (warp_surfels,
// surfel_map.cpp:791-824): 10 threads over poses (inactive) concurrently
// with 10 threads over local surfels (active), one join.
void sm_warp(void *p) { ((MapHolder *)p)->map.warp_surfels(); }

void sm_save_cloud(void *p, const char *path) {
    ((MapHolder *)p)->map.save_cloud(path);
}

void sm_save_mesh(void *p, const char *path) {
    ((MapHolder *)p)->map.save_mesh(path);
}
}
