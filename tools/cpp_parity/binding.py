"""ctypes binding for the compiled reference kernel layer.

Loads tools/cpp_parity/libref_fusion.so (built from the UNMODIFIED
/root/reference/surfel_fusion/src/fusion_functions.cpp by build.sh) and
exposes `RefFusion`, a Python driver for `fuse_initialize_map`
(fusion_functions.cpp:30-83) with introspection of the internal seed /
assignment / normal-map state.  Consumed by tests/test_cpp_parity.py.
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


def build(force: bool = False) -> str:
    """Build libref_fusion.so if missing/stale; returns its path.

    Raises RuntimeError with the compiler output on failure (tests turn
    that into a skip so environments without g++/OpenCV stay green).
    """
    srcs = [os.path.join(_HERE, "driver.cpp"),
            os.path.join(_HERE, "build.sh"),
            os.path.join(_HERE, "shim", "Eigen", "Eigen"),
            os.path.join(_REF_SRC, "fusion_functions.cpp")]
    if (not force and os.path.exists(_LIB)
            and all(os.path.getmtime(_LIB) >= os.path.getmtime(s)
                    for s in srcs if os.path.exists(s))):
        return _LIB
    proc = subprocess.run(["bash", os.path.join(_HERE, "build.sh")],
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"cpp_parity build failed:\n{proc.stdout}\n{proc.stderr}")
    return _LIB


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
