// Parity driver: compiles the UNMODIFIED reference kernel layer
// (/root/reference/surfel_fusion/src/fusion_functions.cpp:7-1006) against
// stub ROS headers, a minimal Eigen shim (shim/Eigen/Eigen) and the
// installed OpenCV, and exposes a flat extern "C" API consumed by the
// ctypes binding (tools/cpp_parity/binding.py).  This is what converts the
// framework's fidelity claim from "matches our NumPy transcription" to
// "matches the running reference binary" (DIVERGENCES.md caveat).
//
// Test-only access hack: the seeds / assignment / norm maps are private
// members of FusionFunctions; remapping `private` to `public` for this
// translation unit exposes them.  Data-member access is resolved at compile
// time, so the kernel TU itself stays byte-identical to a normal build.
// Pre-include every heavy dependency of fusion_functions.h with normal
// access control so the `private public` remap below only affects the
// reference class itself (libstdc++/OpenCV headers miscompile under it).
#include <Eigen/Eigen>
#include <opencv2/opencv.hpp>
#include <cstring>
#include <vector>

#define private public
#include "fusion_functions.h"
#undef private

extern "C" {

void *ff_create(int w, int h, float fx, float fy, float cx, float cy,
                float fuse_far, float fuse_near) {
    FusionFunctions *f = new FusionFunctions();
    f->initialize(w, h, fx, fy, cx, cy, fuse_far, fuse_near);
    return f;
}

void ff_destroy(void *p) { delete (FusionFunctions *)p; }

// Runs fuse_initialize_map (fusion_functions.cpp:30-83) on one frame.
// `local` is an in/out array of reference SurfelElement structs
// (elements.h:22-31; 9 x f32 + 2 x i32, packed); new surfels are written to
// `new_out` (up to max_new) and the true count returned.
int ff_fuse(void *p, int ref_index, const unsigned char *image,
            const float *depth, const float *pose_rowmajor,
            SurfelElement *local, int n_local,
            SurfelElement *new_out, int max_new) {
    FusionFunctions *f = (FusionFunctions *)p;
    cv::Mat img(f->image_height, f->image_width, CV_8UC1, (void *)image);
    cv::Mat dep(f->image_height, f->image_width, CV_32FC1, (void *)depth);
    Eigen::Matrix4f pose;
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) pose(i, j) = pose_rowmajor[i * 4 + j];
    std::vector<SurfelElement> local_v(local, local + n_local);
    std::vector<SurfelElement> new_v;
    f->fuse_initialize_map(ref_index, img, dep, pose, local_v, new_v);
    std::memcpy(local, local_v.data(), n_local * sizeof(SurfelElement));
    int n_new = (int)new_v.size();
    int n_copy = n_new < max_new ? n_new : max_new;
    if (n_copy > 0)
        std::memcpy(new_out, new_v.data(), n_copy * sizeof(SurfelElement));
    return n_new;
}

int ff_seed_count(void *p) {
    return (int)((FusionFunctions *)p)->superpixel_seeds.size();
}

// Seed snapshot after the last ff_fuse call; 14 f32 per seed:
// x, y, size, norm_xyz, posi_xyz, view_cos, mean_depth, mean_intensity,
// fused(0/1), stable(0/1)  (Superpixel_seed, elements.h:5-20).
void ff_get_seeds(void *p, float *out) {
    FusionFunctions *f = (FusionFunctions *)p;
    for (size_t i = 0; i < f->superpixel_seeds.size(); i++) {
        const Superpixel_seed &s = f->superpixel_seeds[i];
        float *o = out + i * 14;
        o[0] = s.x;
        o[1] = s.y;
        o[2] = s.size;
        o[3] = s.norm_x;
        o[4] = s.norm_y;
        o[5] = s.norm_z;
        o[6] = s.posi_x;
        o[7] = s.posi_y;
        o[8] = s.posi_z;
        o[9] = s.view_cos;
        o[10] = s.mean_depth;
        o[11] = s.mean_intensity;
        o[12] = s.fused ? 1.0f : 0.0f;
        o[13] = s.stable ? 1.0f : 0.0f;
    }
}

void ff_get_assignment(void *p, int *out) {
    FusionFunctions *f = (FusionFunctions *)p;
    std::memcpy(out, f->superpixel_index.data(),
                f->superpixel_index.size() * sizeof(int));
}

void ff_get_norm_map(void *p, float *out) {
    FusionFunctions *f = (FusionFunctions *)p;
    std::memcpy(out, f->norm_map.data(), f->norm_map.size() * sizeof(float));
}
}
