"""densesurfelmapping_tpu: TPU-native dense surfel mapping.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
HKUST-Aerial-Robotics/DenseSurfelMapping (ICRA 2019): real-time scalable
dense surfel mapping with loop-closure-consistent global maps.
"""

from .config import (SurfelMapConfig, CameraIntrinsics, FusionProfile,
                     kitti_config, rgbd_config, mono_config,
                     DRIVE_PROFILE, RGBD_PROFILE, KITTI_00_INTRINSICS)
from .core.state import SurfelBank, SuperpixelState, FrameInput

__version__ = "0.1.0"
