"""ctypes bindings for the compiled reference layers.

Loads tools/cpp_parity/libref_fusion.so (the UNMODIFIED
/root/reference/surfel_fusion/src/fusion_functions.cpp, built by build.sh)
and exposes `RefFusion`, a Python driver for `fuse_initialize_map`
(fusion_functions.cpp:30-83) with introspection of the internal seed /
assignment / normal-map state.

Also loads tools/cpp_parity/libref_map.so (the UNMODIFIED reference
ORCHESTRATOR surfel_map.cpp + CameraPoseVisualization.cpp + the kernel
layer, built by build_map.sh against stub ROS/PCL headers) and exposes
`RefSurfelMap`: the real `orb_results_input`/`synchronize_msgs` pipeline,
the warp kernels (surfel_map.cpp:681-824), the BFS (:1643-1674), and the
migration bookkeeping (:1456-1595), with full state introspection and
direct state injection for focused kernel tests.  Consumed by
tests/test_cpp_parity.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_HERE, "libref_fusion.so")
_REF_SRC = os.environ.get("REF_SRC", "/root/reference/surfel_fusion/src")

# Mirrors SurfelElement (elements.h:22-31): 9 x f32 + 2 x i32, no padding.
SURFEL_DTYPE = np.dtype([
    ("px", "<f4"), ("py", "<f4"), ("pz", "<f4"),
    ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
    ("size", "<f4"), ("color", "<f4"), ("weight", "<f4"),
    ("update_times", "<i4"), ("last_update", "<i4")])
assert SURFEL_DTYPE.itemsize == 44

SEED_FIELDS = ("x", "y", "size", "norm_x", "norm_y", "norm_z",
               "posi_x", "posi_y", "posi_z", "view_cos", "mean_depth",
               "mean_intensity", "fused", "stable")


_MAP_LIB = os.path.join(_HERE, "libref_map.so")


def _build_lib(lib, script, srcs, force):
    if (not force and os.path.exists(lib)
            and all(os.path.getmtime(lib) >= os.path.getmtime(s)
                    for s in srcs if os.path.exists(s))):
        return lib
    proc = subprocess.run(["bash", os.path.join(_HERE, script)],
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"cpp_parity build failed:\n{proc.stdout}\n{proc.stderr}")
    return lib


def build(force: bool = False) -> str:
    """Build libref_fusion.so if missing/stale; returns its path.

    Raises RuntimeError with the compiler output on failure (tests turn
    that into a skip so environments without g++/OpenCV stay green).
    """
    return _build_lib(
        _LIB, "build.sh",
        [os.path.join(_HERE, "driver.cpp"),
         os.path.join(_HERE, "build.sh"),
         os.path.join(_HERE, "shim", "Eigen", "Eigen"),
         os.path.join(_REF_SRC, "fusion_functions.cpp")], force)


def build_map(force: bool = False) -> str:
    """Build libref_map.so (orchestrator layer) if missing/stale."""
    shim_map = []
    shim_dir = os.path.join(_HERE, "shim_map")
    for root, _, files in os.walk(shim_dir):
        shim_map += [os.path.join(root, f) for f in files]
    return _build_lib(
        _MAP_LIB, "build_map.sh",
        [os.path.join(_HERE, "map_driver.cpp"),
         os.path.join(_HERE, "build_map.sh"),
         os.path.join(_HERE, "shim", "Eigen", "Eigen"),
         os.path.join(_REF_SRC, "surfel_map.cpp")] + shim_map, force)


class RefFusion:
    """One FusionFunctions instance (fusion_functions.h:23-95)."""

    def __init__(self, width, height, fx, fy, cx, cy,
                 fuse_far=30.0, fuse_near=0.5):
        self._lib = ctypes.CDLL(build())
        self._lib.ff_create.restype = ctypes.c_void_p
        self._lib.ff_create.argtypes = [ctypes.c_int, ctypes.c_int] + \
            [ctypes.c_float] * 6
        self._lib.ff_fuse.restype = ctypes.c_int
        self._lib.ff_fuse.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        for name in ("ff_get_seeds", "ff_get_assignment", "ff_get_norm_map"):
            fn = getattr(self._lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        self._lib.ff_seed_count.restype = ctypes.c_int
        self._lib.ff_seed_count.argtypes = [ctypes.c_void_p]
        self._lib.ff_destroy.argtypes = [ctypes.c_void_p]

        self.width, self.height = int(width), int(height)
        self._h = self._lib.ff_create(
            self.width, self.height, fx, fy, cx, cy, fuse_far, fuse_near)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.ff_destroy(h)
            self._h = None

    def fuse(self, frame_index, image_u8, depth_f32, pose,
             local_surfels=None, max_new=200_000):
        """Run fuse_initialize_map on one frame.

        Returns (local_surfels_after, new_surfels) as SURFEL_DTYPE arrays.
        `local_surfels` is modified C++-style in place semantics (a copy is
        taken; the updated copy is returned).
        """
        image_u8 = np.ascontiguousarray(image_u8, np.uint8)
        depth_f32 = np.ascontiguousarray(depth_f32, np.float32)
        assert image_u8.shape == (self.height, self.width)
        assert depth_f32.shape == (self.height, self.width)
        pose = np.ascontiguousarray(pose, np.float32).reshape(4, 4)
        if local_surfels is None:
            local_surfels = np.zeros(0, SURFEL_DTYPE)
        local = np.ascontiguousarray(local_surfels).copy()
        new = np.zeros(max_new, SURFEL_DTYPE)
        n_new = self._lib.ff_fuse(
            self._h, int(frame_index),
            image_u8.ctypes.data, depth_f32.ctypes.data, pose.ctypes.data,
            local.ctypes.data, len(local), new.ctypes.data, max_new)
        assert n_new <= max_new, "raise max_new"
        return local, new[:n_new].copy()

    # -- introspection of the last fuse call -------------------------------
    @property
    def n_seeds(self):
        return self._lib.ff_seed_count(self._h)

    def seeds(self):
        """dict of per-seed arrays (flat index = sp_y * sp_width + sp_x)."""
        out = np.zeros((self.n_seeds, len(SEED_FIELDS)), np.float32)
        self._lib.ff_get_seeds(self._h, out.ctypes.data)
        return {name: out[:, i].astype(np.float64)
                for i, name in enumerate(SEED_FIELDS)}

    def assignment(self):
        out = np.zeros(self.height * self.width, np.int32)
        self._lib.ff_get_assignment(self._h, out.ctypes.data)
        return out.reshape(self.height, self.width)

    def norm_map(self):
        out = np.zeros(self.height * self.width * 3, np.float32)
        self._lib.ff_get_norm_map(self._h, out.ctypes.data)
        return out.reshape(self.height, self.width, 3)


# --------------------------------------------------------------------------
# orchestrator layer (surfel_map.cpp)
# --------------------------------------------------------------------------

def mat_to_pose7(T: np.ndarray) -> np.ndarray:
    """4x4 -> [px py pz qx qy qz qw] (the ROS Pose layout fed to the
    reference's pose_ros2eigen, surfel_map.cpp:367-379).  Shepperd branch
    selection, matching the Eigen shim and real Eigen."""
    T = np.asarray(T, np.float64)
    r = T[:3, :3]
    tr = r[0, 0] + r[1, 1] + r[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2.0
        w, x = 0.25 * s, (r[2, 1] - r[1, 2]) / s
        y, z = (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2.0
        w, x = (r[2, 1] - r[1, 2]) / s, 0.25 * s
        y, z = (r[0, 1] + r[1, 0]) / s, (r[0, 2] + r[2, 0]) / s
    elif r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2.0
        w, x = (r[0, 2] - r[2, 0]) / s, (r[0, 1] + r[1, 0]) / s
        y, z = 0.25 * s, (r[1, 2] + r[2, 1]) / s
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2.0
        w, x = (r[1, 0] - r[0, 1]) / s, (r[0, 2] + r[2, 0]) / s
        y, z = (r[1, 2] + r[2, 1]) / s, 0.25 * s
    return np.array([T[0, 3], T[1, 3], T[2, 3], x, y, z, w], np.float64)


def pose7_to_mat(p7: np.ndarray) -> np.ndarray:
    """[px py pz qx qy qz qw] -> 4x4 (pose_ros2eigen semantics)."""
    px, py, pz, x, y, z, w = [float(v) for v in p7]
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    T = np.eye(4)
    T[:3, :3] = [[1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)],
                 [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)],
                 [2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)]]
    T[:3, 3] = [px, py, pz]
    return T


class RefSurfelMap:
    """One reference SurfelMap instance (surfel_map.h:48-148), driven
    through the real orb_results_input / synchronize_msgs pipeline with
    state introspection, or via direct state injection for focused
    warp/BFS kernel tests."""

    def __init__(self, width, height, fx, fy, cx, cy,
                 fuse_far=30.0, fuse_near=0.5, drift_free_poses=10):
        lib = ctypes.CDLL(build_map())
        c = ctypes
        lib.sm_set_param.argtypes = [c.c_char_p, c.c_double]
        lib.sm_create.restype = c.c_void_p
        lib.sm_destroy.argtypes = [c.c_void_p]
        lib.sm_orb_input.argtypes = [
            c.c_void_p, c.c_double, c.c_void_p, c.c_int, c.c_int,
            c.c_void_p, c.c_int, c.c_void_p, c.c_int]
        lib.sm_feed_frame.argtypes = [c.c_void_p, c.c_double,
                                      c.c_void_p, c.c_void_p]
        lib.sm_n_poses.restype = c.c_int
        lib.sm_n_poses.argtypes = [c.c_void_p]
        lib.sm_pose_info.argtypes = [c.c_void_p, c.c_int, c.c_void_p,
                                     c.c_void_p, c.c_void_p]
        lib.sm_get_linked.argtypes = [c.c_void_p, c.c_int, c.c_void_p]
        lib.sm_get_attached.argtypes = [c.c_void_p, c.c_int, c.c_void_p]
        lib.sm_n_local.restype = c.c_int
        lib.sm_n_local.argtypes = [c.c_void_p]
        lib.sm_get_local.argtypes = [c.c_void_p, c.c_void_p]
        lib.sm_local_indexs.restype = c.c_int
        lib.sm_local_indexs.argtypes = [c.c_void_p, c.c_void_p, c.c_int]
        lib.sm_inactive_size.restype = c.c_int
        lib.sm_inactive_size.argtypes = [c.c_void_p]
        lib.sm_get_inactive.argtypes = [c.c_void_p, c.c_void_p]
        lib.sm_pointcloud_pose_index.restype = c.c_int
        lib.sm_pointcloud_pose_index.argtypes = [c.c_void_p, c.c_void_p,
                                                 c.c_int]
        lib.sm_driftfree.restype = c.c_int
        lib.sm_driftfree.argtypes = [c.c_void_p, c.c_int, c.c_int,
                                     c.c_void_p, c.c_int]
        lib.sm_inject_pose.argtypes = [
            c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int,
            c.c_void_p, c.c_int, c.c_int]
        lib.sm_set_local_surfels.argtypes = [c.c_void_p, c.c_void_p, c.c_int]
        lib.sm_set_loop_pose.argtypes = [c.c_void_p, c.c_int, c.c_void_p]
        lib.sm_warp.argtypes = [c.c_void_p]
        lib.sm_save_cloud.argtypes = [c.c_void_p, c.c_char_p]
        lib.sm_save_mesh.argtypes = [c.c_void_p, c.c_char_p]
        self._lib = lib

        for k, v in dict(cam_width=width, cam_height=height, cam_fx=fx,
                         cam_fy=fy, cam_cx=cx, cam_cy=cy,
                         fuse_far_distence=fuse_far,
                         fuse_near_distence=fuse_near,
                         drift_free_poses=drift_free_poses).items():
            lib.sm_set_param(k.encode(), float(v))
        self.width, self.height = int(width), int(height)
        self._h = lib.sm_create()

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.sm_destroy(h)
            self._h = None

    # -- real pipeline ------------------------------------------------------
    def orb_input(self, stamp, pose, is_keyframe, ref_index,
                  loop_path, loop_edges=()):
        """orb_results_input with the reference message schema; `pose` and
        loop_path entries are 4x4 matrices (converted to ROS quaternion
        poses exactly as the producer would)."""
        p7 = np.ascontiguousarray(mat_to_pose7(pose))
        path = np.ascontiguousarray(
            np.stack([mat_to_pose7(p) for p in loop_path])
            if len(loop_path) else np.zeros((0, 7)))
        pairs = np.ascontiguousarray(
            np.asarray(loop_edges, np.float32).reshape(-1))
        self._lib.sm_orb_input(
            self._h, float(stamp), p7.ctypes.data, int(is_keyframe),
            int(ref_index), path.ctypes.data, len(path),
            pairs.ctypes.data if len(pairs) else None, len(pairs) // 2)

    def feed_frame(self, stamp, image_u8, depth_f32):
        image_u8 = np.ascontiguousarray(image_u8, np.uint8)
        depth_f32 = np.ascontiguousarray(depth_f32, np.float32)
        assert image_u8.shape == (self.height, self.width)
        self._lib.sm_feed_frame(self._h, float(stamp),
                                image_u8.ctypes.data, depth_f32.ctypes.data)

    # -- state injection ----------------------------------------------------
    def inject_pose(self, cam_pose, loop_pose, linked=(), attached=None,
                    in_local=False):
        c7 = np.ascontiguousarray(mat_to_pose7(cam_pose))
        l7 = np.ascontiguousarray(mat_to_pose7(loop_pose))
        lk = np.ascontiguousarray(np.asarray(linked, np.int32))
        att = (np.ascontiguousarray(attached) if attached is not None
               and len(attached) else np.zeros(0, SURFEL_DTYPE))
        self._lib.sm_inject_pose(
            self._h, c7.ctypes.data, l7.ctypes.data,
            lk.ctypes.data if len(lk) else None, len(lk),
            att.ctypes.data if len(att) else None, len(att), int(in_local))

    def set_local_surfels(self, surfels):
        s = np.ascontiguousarray(surfels)
        self._lib.sm_set_local_surfels(self._h, s.ctypes.data, len(s))

    def set_loop_pose(self, i, loop_pose):
        l7 = np.ascontiguousarray(mat_to_pose7(loop_pose))
        self._lib.sm_set_loop_pose(self._h, int(i), l7.ctypes.data)

    def warp(self):
        self._lib.sm_warp(self._h)

    # -- introspection ------------------------------------------------------
    @property
    def n_poses(self):
        return self._lib.sm_n_poses(self._h)

    def pose_info(self, i):
        cam7 = np.zeros(7)
        loop7 = np.zeros(7)
        info = np.zeros(4, np.int32)
        self._lib.sm_pose_info(self._h, int(i), cam7.ctypes.data,
                               loop7.ctypes.data, info.ctypes.data)
        linked = np.zeros(int(info[3]), np.int32)
        if info[3]:
            self._lib.sm_get_linked(self._h, int(i), linked.ctypes.data)
        return dict(cam_pose=pose7_to_mat(cam7), loop_pose=pose7_to_mat(loop7),
                    cam7=cam7, loop7=loop7,
                    points_begin_index=int(info[0]),
                    points_pose_index=int(info[1]),
                    n_attached=int(info[2]), linked=[int(v) for v in linked])

    def attached(self, i):
        n = self.pose_info(i)["n_attached"]
        out = np.zeros(n, SURFEL_DTYPE)
        if n:
            self._lib.sm_get_attached(self._h, int(i), out.ctypes.data)
        return out

    def local_surfels(self):
        n = self._lib.sm_n_local(self._h)
        out = np.zeros(n, SURFEL_DTYPE)
        if n:
            self._lib.sm_get_local(self._h, out.ctypes.data)
        return out

    def local_indexs(self):
        out = np.zeros(4096, np.int32)
        n = self._lib.sm_local_indexs(self._h, out.ctypes.data, 4096)
        return sorted(int(v) for v in out[:n])

    def inactive_cloud(self):
        n = self._lib.sm_inactive_size(self._h)
        out = np.zeros((n, 4), np.float32)
        if n:
            self._lib.sm_get_inactive(self._h, out.ctypes.data)
        return out

    def pointcloud_pose_index(self):
        out = np.zeros(4096, np.int32)
        n = self._lib.sm_pointcloud_pose_index(self._h, out.ctypes.data, 4096)
        return [int(v) for v in out[:n]]

    def driftfree_poses(self, root, radius):
        out = np.zeros(8192, np.int32)
        n = self._lib.sm_driftfree(self._h, int(root), int(radius),
                                   out.ctypes.data, 8192)
        return [int(v) for v in out[:n]]

    def save_cloud(self, path):
        self._lib.sm_save_cloud(self._h, path.encode())

    def save_mesh(self, path):
        self._lib.sm_save_mesh(self._h, path.encode())
