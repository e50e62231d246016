"""Axis-sharded SGM aggregation: numerics pinned vs the replicated path.

parallel/sgm_sharding.py shards each SGM path family along the axis
perpendicular to its scan (x± over rows, the batched vertical + diagonal
family over columns with a ppermute-ring carry exchange for the diagonal
rolls; see its module doc).  These tests pin, on the virtual 8-device
mesh, that the sharded disparity equals `models/stereo.disparity` with
the lax.scan backend BITWISE — including the divisibility-padding cases
where H or W is not a multiple of the shard count (the 8-path cases
exercise the ring exchange and its global-border restart masks).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from densesurfelmapping_tpu.models import stereo
from densesurfelmapping_tpu.parallel import sharding, sgm_sharding


def stereo_pair(h=44, w=93, max_d=24, seed=0):
    """Synthetic textured pair: left is a warped copy of right with a
    smooth disparity ramp plus a discontinuity block (same construction as
    tests/test_stereo.py's fixtures, sized for the 8-device mesh)."""
    rng = np.random.default_rng(seed)
    right = rng.uniform(0.0, 255.0, (h, w)).astype(np.float32)
    # smooth the noise so census has structure (3x3 box, numpy)
    p = np.pad(right, 1, mode="edge")
    right = sum(p[dy:dy + h, dx:dx + w]
                for dy in (0, 1, 2) for dx in (0, 1, 2)) / 9.0
    disp = 4.0 + 10.0 * (np.arange(w) / w)[None, :] \
        + 6.0 * (np.arange(h) / h)[:, None]
    disp[h // 3:h // 2, w // 4:w // 2] += 5.0
    x = np.arange(w)[None, :] - disp
    xi = np.clip(x.astype(np.int32), 0, w - 1)
    left = np.take_along_axis(right, xi, axis=1).astype(np.float32)
    return jnp.asarray(left), jnp.asarray(right), max_d


def replicated_disparity(left, right, cfg):
    # lax.scan backend (sgm_pallas=False); the Pallas kernels are pinned
    # bitwise-equal to it by tests/test_stereo.py
    return stereo.jitted_disparity(cfg)(left, right)


@pytest.mark.parametrize("paths,post_median", [(4, False), (8, True)])
def test_sharded_disparity_matches_replicated(paths, post_median):
    left, right, max_d = stereo_pair()
    cfg = stereo.StereoConfig(max_disparity=max_d, aggregation="sgm",
                              sgm_paths=paths, sgm_pallas=False,
                              post_median=post_median)
    want = np.asarray(replicated_disparity(left, right, cfg))

    mesh = sharding.make_mesh(8, data=1)
    fn = sgm_sharding.sharded_sgm_disparity(mesh, cfg, *left.shape)
    got = np.asarray(fn(left, right))

    assert want.shape == got.shape
    np.testing.assert_array_equal(got, want)
    # sanity: the scene actually produces matches to compare
    assert (want > 0).mean() > 0.3


def test_sharded_disparity_divisible_shapes():
    """H and W exact multiples of the shard count (no padding path)."""
    left, right, max_d = stereo_pair(h=48, w=96, seed=3)
    cfg = stereo.StereoConfig(max_disparity=max_d, aggregation="sgm",
                              sgm_paths=4, sgm_pallas=False,
                              post_median=False)
    want = np.asarray(replicated_disparity(left, right, cfg))
    mesh = sharding.make_mesh(8, data=1)
    fn = sgm_sharding.sharded_sgm_disparity(mesh, cfg, *left.shape)
    np.testing.assert_array_equal(np.asarray(fn(left, right)), want)


def test_sharded_disparity_bf16_carries():
    """sgm_carry_bf16 mode shards identically (the clamp grouping keeps
    every carry bf16-exact; models/stereo.StereoConfig doc)."""
    left, right, max_d = stereo_pair(seed=7)
    cfg = stereo.StereoConfig(max_disparity=max_d, aggregation="sgm",
                              sgm_paths=8, sgm_pallas=False,
                              sgm_carry_bf16=True, post_median=False)
    want = np.asarray(replicated_disparity(left, right, cfg))
    mesh = sharding.make_mesh(8, data=1)
    fn = sgm_sharding.sharded_sgm_disparity(mesh, cfg, *left.shape)
    np.testing.assert_array_equal(np.asarray(fn(left, right)), want)


def test_sad_cost_rejected():
    mesh = sharding.make_mesh(8, data=1)
    cfg = stereo.StereoConfig(cost="sad", aggregation="sgm")
    with pytest.raises(ValueError):
        sgm_sharding.sharded_sgm_disparity(mesh, cfg, 48, 96)


def test_sharded_prior_rescue_matches_dense():
    """prior_rescue computes the same function on both backends (ADVICE
    r4: the sharded path used to silently drop prior_disp): sharded ==
    dense bitwise with a replicated prior active, and the prior actually
    changes the output somewhere (so the pin is not vacuous)."""
    left, right, max_d = stereo_pair(seed=11)
    cfg = stereo.StereoConfig(max_disparity=max_d, aggregation="sgm",
                              sgm_paths=4, sgm_pallas=False,
                              post_median=False, prior_rescue=True)
    base = np.asarray(replicated_disparity(left, right, cfg))
    # a prior that vouches everywhere the matcher found SOMETHING: rescue
    # re-admits gate-rejected near-ties
    prior = jnp.asarray(np.where(base > 0, base, 8.0).astype(np.float32))
    want = np.asarray(stereo.disparity(left, right, cfg, prior_disp=prior))

    mesh = sharding.make_mesh(8, data=1)
    fn = sgm_sharding.sharded_sgm_disparity(mesh, cfg, *left.shape)
    got = np.asarray(fn(left, right, prior))
    np.testing.assert_array_equal(got, want)
    # inert without a prior, bitwise
    np.testing.assert_array_equal(np.asarray(fn(left, right)), base)
