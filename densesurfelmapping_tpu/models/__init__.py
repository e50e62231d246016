from .stereo import StereoConfig, disparity, depth_from_stereo
