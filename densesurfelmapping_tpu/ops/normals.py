"""Geometry engine: space map, pixel normals, robust per-seed plane fit.

TPU-native re-design of `calculate_norms` (`fusion_functions.cpp:916-958`):

* `calculate_spaces_kernel` (:644-662)       -> one back-projected grid
* `calculate_pixels_norms_kernel` (:664-712) -> shifted-slice cross products
* `calculate_sp_depth_norms_kernel` (:792-914) + `get_huber_norm` (:104-188)
  -> masked window reductions + a *batched* 5-iteration Huber Gauss-Newton:
     the per-seed 4x4 Hessian becomes one einsum over (seeds, window, 4)
     tensors (MXU work) and the solve a batched `jnp.linalg.solve`.

The reference accumulates the GN normal equations in float64 Eigen types; we
run float32 (TPU-native) with the same +5*I damping — parity is checked by
golden tests at tolerance (tests/test_golden_superpixel.py::
test_plane_fit_matches / test_pixel_normals_match).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SurfelMapConfig
from ..core.state import SuperpixelState
from ..core import geometry
from . import windows as W
from .superpixel import _static_geometry


def space_map(config: SurfelMapConfig, depth: jnp.ndarray,
              geom=None) -> jnp.ndarray:
    """(H, W) depth -> (H, W, 3) camera-frame points (z==depth, no gating),
    mirroring `calculate_spaces_kernel` (`fusion_functions.cpp:644-662`).

    geom: per-shard geometry override with GLOBAL pixel coordinate planes
    (column-slab SPMD path) — the slab's u coordinates are absolute, so
    back-projection stays geometrically identical to the full frame."""
    cam = config.camera
    if geom is not None:
        return geometry.back_project(
            jnp.asarray(geom["px_x"], jnp.float32),
            jnp.asarray(geom["px_y"], jnp.float32),
            depth, cam.fx, cam.fy, cam.cx, cam.cy)
    return geometry.back_project_grid(depth, cam.fx, cam.fy, cam.cx, cam.cy)


def pixel_normals(config: SurfelMapConfig, space: jnp.ndarray,
                  geom=None) -> jnp.ndarray:
    """Right x down cross-product normals with a view-angle gate
    (`calculate_pixels_norms_kernel`, `fusion_functions.cpp:664-712`).

    Interior pixels only (rows/cols 1..orig-2); zero elsewhere and wherever
    any of {self, right, down} has z < 0.1 or |view angle| < MAX_ANGLE_COS.
    """
    h, w, _ = space.shape
    me = space
    right = jnp.pad(space[:, 1:], ((0, 0), (0, 1), (0, 0)))
    down = jnp.pad(space[1:], ((0, 1), (0, 0), (0, 0)))

    dz_ok = (me[..., 2] >= 0.1) & (right[..., 2] >= 0.1) & (down[..., 2] >= 0.1)

    r = right - me
    d = down - me
    n = jnp.cross(r, d)
    length = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(length, 1e-20)

    me_len = jnp.linalg.norm(me, axis=-1)
    view = jnp.sum(n * me, axis=-1) / jnp.maximum(me_len, 1e-20)
    angle_ok = jnp.abs(view) >= config.max_angle_cos

    if geom is not None:
        row = jnp.asarray(geom["px_y"]).astype(jnp.int32)
        col = jnp.asarray(geom["px_x"]).astype(jnp.int32)
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((row >= 1) & (row < config.height - 1)
                & (col >= 1) & (col < config.width - 1))

    keep = (dz_ok & angle_ok & interior)[..., None]
    return jnp.where(keep, n, 0.0)


def _solve4(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 4x4 solve via cofactor (adjugate) expansion — pure VPU math.

    `jnp.linalg.solve` lowers to batched LU which costs ~40 ms for 7.5k
    systems on a v5e; the closed-form inverse (what Eigen's Matrix4d
    .inverse() uses in the reference, fusion_functions.cpp:176) runs in
    microseconds.  H: (..., 4, 4), b: (..., 4).
    """
    m = [[H[..., i, j] for j in range(4)] for i in range(4)]

    def det3(r0, r1, r2, c0, c1, c2):
        return (m[r0][c0] * (m[r1][c1] * m[r2][c2] - m[r1][c2] * m[r2][c1])
                - m[r0][c1] * (m[r1][c0] * m[r2][c2] - m[r1][c2] * m[r2][c0])
                + m[r0][c2] * (m[r1][c0] * m[r2][c1] - m[r1][c1] * m[r2][c0]))

    rows = (0, 1, 2, 3)
    cof = [[None] * 4 for _ in range(4)]
    for i in range(4):
        ri = tuple(r for r in rows if r != i)
        for j in range(4):
            cj = tuple(c for c in rows if c != j)
            minor = det3(ri[0], ri[1], ri[2], cj[0], cj[1], cj[2])
            cof[i][j] = minor if (i + j) % 2 == 0 else -minor
    det = (m[0][0] * cof[0][0] + m[0][1] * cof[0][1]
           + m[0][2] * cof[0][2] + m[0][3] * cof[0][3])
    inv_det = 1.0 / det
    # x = H^-1 b ; (H^-1)_{ij} = cof[j][i] * inv_det (adjugate transpose)
    x = [(cof[0][i] * b[..., 0] + cof[1][i] * b[..., 1]
          + cof[2][i] * b[..., 2] + cof[3][i] * b[..., 3]) * inv_det
         for i in range(4)]
    return jnp.stack(x, axis=-1)


def _huber_gauss_newton(points: jnp.ndarray, mask: jnp.ndarray,
                        n0: jnp.ndarray, huber_range: float):
    """Batched `get_huber_norm` (`fusion_functions.cpp:104-188`).

    points: (S, K, 3) camera-frame inlier positions, mask: (S, K) validity,
    n0: (S, 3) initial unit normal (nb starts at 0).  Returns (S, 4) unit
    plane [nx, ny, nz, nb] with n.p + nb = 0 for on-plane points.
    """
    hr = jnp.float32(huber_range)
    cnt = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(jnp.where(mask[..., None], points, 0.0), axis=1) / cnt
    centered = points - mean[:, None, :]

    ones = jnp.ones(points.shape[:2], jnp.float32)
    A = jnp.concatenate([centered, ones[..., None]], axis=-1)   # (S, K, 4)
    A = jnp.where(mask[..., None], A, 0.0)

    n = jnp.concatenate([n0, jnp.zeros((n0.shape[0], 1), jnp.float32)], axis=-1)
    eye5 = 5.0 * jnp.eye(4, dtype=jnp.float32)

    # The normal equations are tiny in i,j (4x4) but huge in (S, K) — as
    # einsums XLA lowers them to S-batched (4,K)@(K,4) matmuls whose MXU
    # utilization is ~0.1% (4/128 x 4/128 of each 128x128 tile), measured
    # ~7 ms/frame on the v5e.  Expanded as elementwise products + K-axis
    # reductions they are pure VPU streams over (S, K) planes (f32-exact;
    # only the K-sum order changes vs the einsum).
    Ai = [A[..., i] for i in range(4)]                          # 4 x (S, K)
    for _ in range(5):
        r = sum(Ai[i] * n[:, i:i + 1] for i in range(4))        # (S, K)
        inl = (r < hr) & (r > -hr) & mask
        jw = jnp.where(inl, 2.0 * r,
                       jnp.where(r >= hr, hr,
                                 jnp.where(r <= -hr, -hr, 0.0)))
        jw = jnp.where(mask, jw, 0.0)
        jac = jnp.stack([jnp.sum(Ai[i] * jw, axis=-1)
                         for i in range(4)], axis=-1)           # (S, 4)
        hw = jnp.where(inl, 2.0, 0.0)
        hess_ij = [[None] * 4 for _ in range(4)]
        for i in range(4):
            hwi = hw * Ai[i]
            for j in range(i, 4):
                hess_ij[i][j] = hess_ij[j][i] = jnp.sum(hwi * Ai[j],
                                                        axis=-1)
        hess = jnp.stack([jnp.stack(row, axis=-1)
                          for row in hess_ij], axis=-2) + eye5  # (S, 4, 4)
        n = n - _solve4(hess, jac)

    # uncenter: nb -= n . mean, then normalize the full 4-vector by |n_xyz|
    nb = n[:, 3] - jnp.sum(n[:, :3] * mean, axis=-1)
    length = jnp.linalg.norm(n[:, :3], axis=-1)
    safe = jnp.maximum(length, 1e-20)
    return jnp.concatenate([n[:, :3] / safe[:, None],
                            (nb / safe)[:, None]], axis=-1)


def refine_seed_planes(config: SurfelMapConfig, seeds: SuperpixelState,
                       assignment: jnp.ndarray, depth_win: jnp.ndarray,
                       space: jnp.ndarray, norms: jnp.ndarray,
                       geom=None) -> SuperpixelState:
    """Per-seed robust plane fit (`calculate_sp_depth_norms_kernel`,
    `fusion_functions.cpp:792-914`).

    For every seed simultaneously: gather member pixels of its window, gate
    on >=16 valid depths and >=80% Huber inliers, average inlier pixel
    normals, refine with batched Huber GN over inlier 3D positions, project
    the seed center onto the plane, orient toward the camera.
    """
    sp = config.sp_size
    g = geom or _static_geometry(config)
    rows, cols = seeds.x.shape
    S = rows * cols
    K = 4 * sp * sp
    hr = jnp.float32(config.profile.huber_range)
    cam = config.camera

    assign_win = W.extract_windows(assignment, sp)
    # this pass admits the last row/column (flat-index bound in the C++,
    # fusion_functions.cpp:815-817), unlike update_seeds' clamped window
    member = (assign_win == jnp.asarray(g["flat_id"])[..., None]) \
        & jnp.asarray(g["in_image"])                       # (R, C, K)

    # windowed field planes
    nx_w = W.extract_windows(norms[..., 0], sp)
    ny_w = W.extract_windows(norms[..., 1], sp)
    nz_w = W.extract_windows(norms[..., 2], sp)
    px_w = W.extract_windows(space[..., 0], sp)
    py_w = W.extract_windows(space[..., 1], sp)
    pz_w = W.extract_windows(space[..., 2], sp)

    # squared pixel distance to the (float) seed centroid, over ALL members
    wy = jnp.asarray(g["win_y"], jnp.float32)
    wx = jnp.asarray(g["win_x"], jnp.float32)
    dist = ((wx - seeds.x[..., None]) ** 2 + (wy - seeds.y[..., None]) ** 2)
    max_dist = jnp.max(jnp.where(member, dist, 0.0), axis=-1)

    valid_d = member & (depth_win > 0.05)
    nd = jnp.sum(valid_d, axis=-1).astype(jnp.float32)

    # Huber inliers around the seed's (already Newton-refined) mean depth
    resid = seeds.mean_depth[..., None] - depth_win
    inlier = valid_d & (resid < hr) & (resid > -hr)
    ni = jnp.sum(inlier, axis=-1).astype(jnp.float32)

    sum_n = jnp.stack([W.masked_sum(nx_w, inlier),
                       W.masked_sum(ny_w, inlier),
                       W.masked_sum(nz_w, inlier)], axis=-1)    # (R, C, 3)
    nlen = jnp.linalg.norm(sum_n, axis=-1, keepdims=True)
    n_avg = sum_n / jnp.maximum(nlen, 1e-20)

    ok = ((nd >= 16.0)
          & (ni / jnp.maximum(nd, 1.0) >= 0.8)
          & (nlen[..., 0] > 1e-20))

    # batched GN over inlier positions
    pts = jnp.stack([px_w, py_w, pz_w], axis=-1).reshape(S, K, 3)
    plane = _huber_gauss_newton(pts, inlier.reshape(S, K),
                                n_avg.reshape(S, 3),
                                config.profile.huber_range)
    plane = plane.reshape(rows, cols, 4)

    # project the seed centroid (at mean depth) onto the fitted plane
    avg = geometry.back_project(seeds.x, seeds.y, seeds.mean_depth,
                                cam.fx, cam.fy, cam.cx, cam.cy)
    k = -jnp.sum(avg * plane[..., :3], axis=-1) - plane[..., 3]
    avg = avg + k[..., None] * plane[..., :3]
    mean_depth = avg[..., 2]

    view_cos = -jnp.sum(plane[..., :3] * avg, axis=-1) \
        / jnp.maximum(jnp.linalg.norm(avg, axis=-1), 1e-20)
    flip = view_cos < 0
    norm_out = jnp.where(flip[..., None], -plane[..., :3], plane[..., :3])
    view_cos = jnp.abs(view_cos)

    okn = ok[..., None]
    return seeds.replace(
        norm=jnp.where(okn, norm_out, seeds.norm),
        pos=jnp.where(okn, avg, seeds.pos),
        mean_depth=jnp.where(ok, mean_depth, seeds.mean_depth),
        view_cos=jnp.where(ok, view_cos, seeds.view_cos),
        size=jnp.where(ok, jnp.sqrt(max_dist), seeds.size),
    )


def compute_seed_planes(config: SurfelMapConfig, seeds: SuperpixelState,
                        assignment: jnp.ndarray, depth: jnp.ndarray,
                        geom=None):
    """`calculate_norms` composite: space map + pixel normals + plane fit.
    Returns (seeds', space (H,W,3)) — space is reused by the fusion gates."""
    space = space_map(config, depth, geom=geom)
    norms = pixel_normals(config, space, geom=geom)
    depth_win = W.extract_windows(depth, config.sp_size)
    seeds = refine_seed_planes(config, seeds, assignment, depth_win,
                               space, norms, geom=geom)
    return seeds, space
