"""Cross-check: Pallas SLIC kernels == pure-XLA SLIC path.

Runs the Pallas kernels in interpret mode on the CPU backend against the
jnp implementation (which itself is golden-tested against a NumPy
transcription of the reference C++ in test_golden_superpixel.py).  Small
frame so interpret mode stays fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densesurfelmapping_tpu.config import (SurfelMapConfig, CameraIntrinsics,
                                           DRIVE_PROFILE)
from densesurfelmapping_tpu.core.state import pad_frame
from densesurfelmapping_tpu.ops import superpixel
from densesurfelmapping_tpu.io import synthetic


@pytest.fixture(scope="module")
def small_config():
    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    return SurfelMapConfig(camera=cam, profile=DRIVE_PROFILE,
                           surfel_capacity=4096)


@pytest.fixture(scope="module")
def frame(small_config):
    scene = synthetic.default_scene()
    pose = np.eye(4)
    img, dep = scene.render(small_config, pose, depth_noise=0.02, seed=7)
    pi, pd = pad_frame(small_config, img, dep)
    return jnp.asarray(pi), jnp.asarray(pd)


def test_pallas_matches_xla_slic(small_config, frame):
    image, depth = frame
    seeds_x, asg_x = jax.jit(
        lambda i, d: superpixel.run_slic(small_config, i, d,
                                         use_pallas=False))(image, depth)
    seeds_p, asg_p = jax.jit(
        lambda i, d: superpixel.run_slic(small_config, i, d,
                                         use_pallas=True))(image, depth)

    asg_x = np.asarray(asg_x)
    asg_p = np.asarray(asg_p)
    mismatch = (asg_x != asg_p).mean()
    # identical math modulo f32 reduction order; a handful of boundary
    # pixels may tie-break differently
    assert mismatch < 0.01, f"assignment mismatch fraction {mismatch}"

    for name in ("x", "y", "mean_intensity", "mean_depth"):
        a = np.asarray(getattr(seeds_x, name))
        b = np.asarray(getattr(seeds_p, name))
        # compare on seeds whose membership agrees between the two paths
        ok = np.isclose(a, b, rtol=5e-3, atol=5e-3)
        assert ok.mean() > 0.98, f"{name}: only {ok.mean():.3f} close"

    st_x = np.asarray(seeds_x.stable)
    st_p = np.asarray(seeds_p.stable)
    assert (st_x == st_p).mean() > 0.97


def test_pallas_zero_depth(small_config):
    h, w = small_config.padded_height, small_config.padded_width
    image = jnp.zeros((h, w), jnp.float32)
    depth = jnp.zeros((h, w), jnp.float32)
    seeds, asg = jax.jit(
        lambda i, d: superpixel.run_slic(small_config, i, d,
                                         use_pallas=True))(image, depth)
    assert not np.isnan(np.asarray(seeds.mean_depth)).any()
    assert not np.isnan(np.asarray(seeds.x)).any()
    # uniform image: every valid pixel still gets some seed
    valid = np.zeros((h, w), bool)
    valid[:small_config.height, :small_config.width] = True
    assert (np.asarray(asg)[valid] >= 0).all()
