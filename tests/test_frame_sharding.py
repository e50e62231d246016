"""Column-slab frame-stage sharding: numerics pinned vs the replicated path.

parallel/frame_sharding.py shards SLIC + plane fit over image columns with a
redundant halo (see its module doc).  These tests pin that the slab SPMD
segmentation and the framestage-sharded fuse step reproduce the replicated
implementations on the virtual 8-device mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.core.state import FrameInput, SurfelBank, pad_frame
from densesurfelmapping_tpu.ops import superpixel as SPX
from densesurfelmapping_tpu.ops import normals as NRM
from densesurfelmapping_tpu.parallel import sharding, frame_sharding
from densesurfelmapping_tpu.io import synthetic

from test_golden_superpixel import synthetic_frame


def make_config(width=128, height=48):
    cam = CameraIntrinsics(width=width, height=height,
                           fx=80.0, fy=82.0, cx=width / 2.0 - 0.5,
                           cy=height / 2.0 - 0.5)
    return SurfelMapConfig(camera=cam, surfel_capacity=8192, lane_align=8)


def replicated_segmentation(cfg, image, depth):
    seeds, assignment = SPX.run_slic(cfg, image, depth, use_pallas=False)
    seeds, _ = NRM.compute_seed_planes(cfg, seeds, assignment, depth)
    return seeds, assignment


@pytest.mark.parametrize("n_slabs", [2, 8])
def test_slab_segmentation_matches_replicated(n_slabs):
    """Owned-region outputs of the column-slab SPMD segmentation equal the
    full-frame computation (redundant halo covers the dependency cone)."""
    cfg = make_config()
    image, depth = synthetic_frame(cfg)
    pi, pd = pad_frame(cfg, image, depth)
    pi, pd = jnp.asarray(pi), jnp.asarray(pd)

    want_seeds, want_assign = jax.jit(
        lambda i, d: replicated_segmentation(cfg, i, d))(pi, pd)

    mesh = sharding.make_mesh(n_slabs, data=1)
    ext = frame_sharding._extended_geometry(cfg, n_slabs)

    def body(image, depth):
        return frame_sharding.slab_segmentation(cfg, ext, n_slabs,
                                                image, depth)

    from jax.sharding import PartitionSpec as P
    seeds_spec = jax.tree.map(lambda _: P(), want_seeds)
    # check_vma=False: the all_gather'ed outputs ARE replicated across
    # "surfel", but JAX's varying-axes inference cannot prove it
    got_seeds, got_assign = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P()),
        out_specs=(seeds_spec, P()), check_vma=False))(pi, pd)

    np.testing.assert_array_equal(np.asarray(got_assign),
                                  np.asarray(want_assign))
    for name in ("x", "y", "mean_intensity", "mean_depth", "size",
                 "view_cos", "norm", "pos"):
        got = np.asarray(getattr(got_seeds, name))
        want = np.asarray(getattr(want_seeds, name))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got_seeds.stable),
                                  np.asarray(want_seeds.stable))


def test_framestage_fuse_matches_replicated_fuse():
    """The framestage-sharded fuse step produces the same banks as the
    replicated-frame sharded step over two frames and two streams."""
    cfg = make_config()
    scene = synthetic.default_scene()
    mesh = sharding.make_mesh(8, data=2)
    step_rep = sharding.sharded_fuse_frame(cfg, mesh)
    step_col = frame_sharding.sharded_fuse_frame_framestage(cfg, mesh)

    poses = synthetic.forward_trajectory(2, step=0.3)
    banks_rep = sharding.replicate_banks(mesh, cfg, n_streams=2)
    banks_col = sharding.replicate_banks(mesh, cfg, n_streams=2)

    for t in range(2):
        p0, p1 = poses[t], poses[(t + 1) % 2]
        imgs, deps = [], []
        for p in (p0, p1):
            img, dep = scene.render(cfg, p)
            pi, pd = pad_frame(cfg, img, dep)
            imgs.append(pi)
            deps.append(pd)
        frames = FrameInput(
            image=jnp.asarray(np.stack(imgs)),
            depth=jnp.asarray(np.stack(deps)),
            pose=jnp.asarray(np.stack([p0, p1]), jnp.float32),
            frame_index=jnp.full((2,), t, jnp.int32))
        banks_rep, stats_rep = step_rep(
            banks_rep, sharding.shard_frames(mesh, frames))
        banks_col, stats_col = step_col(
            banks_col, sharding.shard_frames(mesh, frames))

    np.testing.assert_array_equal(np.asarray(stats_rep["n_new"]),
                                  np.asarray(stats_col["n_new"]))
    np.testing.assert_array_equal(np.asarray(banks_rep.count),
                                  np.asarray(banks_col.count))
    for f in ("position", "normal", "color", "size", "weight"):
        np.testing.assert_allclose(
            np.asarray(getattr(banks_rep, f)),
            np.asarray(getattr(banks_col, f)), atol=1e-5, err_msg=f)
    np.testing.assert_array_equal(np.asarray(banks_rep.update_times),
                                  np.asarray(banks_col.update_times))
