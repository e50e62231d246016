"""Clean-room NumPy transcription of the reference mapping-core semantics.

Written from the behavioral spec of `fusion_functions.cpp` (see file:line
cites below) to serve as the golden oracle for the TPU kernels — NOT copied
code: scalar loops, float64 accumulation, no vectorization tricks.

Deliberate divergences from the C++ (documented, matched by the JAX side):
  * per-seed semantics for empty seeds in update_seeds (the C++ `return` at
    fusion_functions.cpp:516-517 kills the rest of a worker thread's chunk);
  * pixel sweeps read the seed `stable` flags as a snapshot from the sweep
    start (the C++ sweep is racy across 10 threads);
  * a seed whose inlier normal sum is exactly zero is skipped instead of
    producing NaN (C++ divides by zero at fusion_functions.cpp:864-871).
"""

from __future__ import annotations

import dataclasses
import numpy as np


@dataclasses.dataclass
class RefParams:
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    fuse_near: float = 0.5
    fuse_far: float = 30.0
    sp_size: int = 8
    iterations: int = 3
    max_angle_cos: float = 0.1
    huber_range: float = 0.4
    baseline: float = 0.5
    disparity_error: float = 4.0
    min_tolerate_diff: float = 0.1

    @property
    def sp_width(self):
        return self.width // self.sp_size

    @property
    def sp_height(self):
        return self.height // self.sp_size


class Seeds:
    """AoS-of-arrays seed store, flat index = sp_y * sp_width + sp_x."""

    def __init__(self, n):
        z = lambda: np.zeros(n, np.float64)
        self.x, self.y = z(), z()
        self.size = z()
        self.norm = np.zeros((n, 3), np.float64)
        self.pos = np.zeros((n, 3), np.float64)
        self.view_cos = z()
        self.mean_depth = z()
        self.mean_intensity = z()
        self.fused = np.zeros(n, bool)
        self.stable = np.zeros(n, bool)


def back_project(u, v, depth, p):
    x = (u - p.cx) / p.fx * depth
    y = (v - p.cy) / p.fy * depth
    return np.array([x, y, depth], np.float64)


def initialize_seeds(p: RefParams, image, depth) -> Seeds:
    sp = p.sp_size
    seeds = Seeds(p.sp_width * p.sp_height)
    for sy in range(p.sp_height):
        for sx in range(p.sp_width):
            i = sy * p.sp_width + sx
            ix = min(sx * sp + sp // 2, p.width - 1)
            iy = min(sy * sp + sp // 2, p.height - 1)
            seeds.x[i], seeds.y[i] = ix, iy
            seeds.mean_intensity[i] = image[iy, ix]
            seeds.mean_depth[i] = depth[iy, ix]
            if seeds.mean_depth[i] < 0.01:
                xb = max(sx * sp + sp // 2 - sp, 0)
                yb = max(sy * sp + sp // 2 - sp, 0)
                xe = min(sx * sp + sp // 2 + sp, p.width - 1)
                ye = min(sy * sp + sp // 2 + sp, p.height - 1)
                found = False
                for cy in range(yb, ye):
                    for cx_ in range(xb, xe):
                        if depth[cy, cx_] > 0.01:
                            seeds.mean_depth[i] = depth[cy, cx_]
                            found = True
                            break
                    if found:
                        break
    return seeds


def _cost(p, seeds, intensity, inv_depth, x, y, sp_idx):
    sp = p.sp_size
    dist = (seeds.x[sp_idx] - x) ** 2 + (seeds.y[sp_idx] - y) ** 2
    nodepth = dist / ((sp // 2) * (sp // 2))
    idiff = seeds.mean_intensity[sp_idx] - intensity
    nodepth += idiff * idiff / 100.0
    depth_cost = nodepth
    has = seeds.mean_depth[sp_idx] > 0 and inv_depth > 0
    if has:
        dd = 1.0 / seeds.mean_depth[sp_idx] - inv_depth
        depth_cost += dd * dd * 400.0
    return nodepth, depth_cost, has


def update_pixels(p: RefParams, seeds: Seeds, image, depth, assignment):
    sp = p.sp_size
    stable_snapshot = seeds.stable.copy()
    new_assign = assignment.copy()
    claimed = np.zeros(len(seeds.x), bool)
    for y in range(p.height):
        for x in range(p.width):
            cur = assignment[y, x]
            if cur >= 0 and stable_snapshot[cur]:
                continue
            intensity = float(image[y, x])
            inv_d = 1.0 / depth[y, x] if depth[y, x] > 0.01 else 0.0
            bx, by = x // sp, y // sp
            best_d, best_d_i = 1e18, -1
            best_nd, best_nd_i = 1e18, -1
            all_has = True
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    cxs, cys = bx + di, by + dj
                    dsx = abs(cxs * sp + sp // 2 - x)
                    dsy = abs(cys * sp + sp // 2 - y)
                    if (dsx < sp and dsy < sp and 0 <= cxs < p.sp_width
                            and 0 <= cys < p.sp_height):
                        idx = cys * p.sp_width + cxs
                        nd, dc, has = _cost(p, seeds, intensity, inv_d, x, y, idx)
                        all_has &= has
                        if dc < best_d:
                            best_d, best_d_i = dc, idx
                        if nd < best_nd:
                            best_nd, best_nd_i = nd, idx
            pick = best_d_i if all_has else best_nd_i
            new_assign[y, x] = pick
            if pick >= 0:
                claimed[pick] = True
    seeds.stable &= ~claimed
    return new_assign


def update_seeds(p: RefParams, seeds: Seeds, image, depth, assignment):
    sp = p.sp_size
    for i in range(len(seeds.x)):
        if seeds.stable[i]:
            continue
        sx, sy = i % p.sp_width, i // p.sp_width
        xb = max(sx * sp + sp // 2 - sp, 0)
        yb = max(sy * sp + sp // 2 - sp, 0)
        xe = min(sx * sp + sp // 2 + sp, p.width - 1)
        ye = min(sy * sp + sp // 2 + sp, p.height - 1)
        sum_x = sum_y = sum_i = n = 0.0
        depths = []
        for cy in range(yb, ye):
            for cx_ in range(xb, xe):
                if assignment[cy, cx_] == i:
                    sum_x += cx_
                    sum_y += cy
                    sum_i += float(image[cy, cx_])
                    n += 1.0
                    if depth[cy, cx_] > 0.1:
                        depths.append(float(depth[cy, cx_]))
        if n == 0:
            continue  # per-seed semantics (see module docstring)
        sum_i /= n
        sum_x /= n
        sum_y /= n
        diff = (abs(seeds.mean_intensity[i] - sum_i)
                + abs(seeds.x[i] - sum_x) + abs(seeds.y[i] - sum_y))
        seeds.mean_intensity[i] = sum_i
        seeds.x[i] = sum_x
        seeds.y[i] = sum_y
        if diff < 0.2:
            seeds.stable[i] = True
        if depths:
            mean = sum(depths) / len(depths)
            for _ in range(5):
                sa = sb = 0.0
                for d in depths:
                    r = mean - d
                    if -p.huber_range < r < p.huber_range:
                        sa += 2 * r
                        sb += 2
                    else:
                        sa += p.huber_range if r > 0 else -p.huber_range
                delta = -sa / (sb + 10.0)
                mean += delta
                if abs(delta) < 0.01:
                    break
            seeds.mean_depth[i] = mean
        else:
            seeds.mean_depth[i] = 0.0


def compute_space_map(p: RefParams, depth):
    space = np.zeros((p.height, p.width, 3), np.float64)
    for y in range(p.height):
        for x in range(p.width):
            space[y, x] = back_project(x, y, depth[y, x], p)
    return space


def compute_pixel_norms(p: RefParams, space):
    norms = np.zeros((p.height, p.width, 3), np.float64)
    for y in range(1, p.height - 1):
        for x in range(1, p.width - 1):
            me = space[y, x]
            right = space[y, x + 1]
            down = space[y + 1, x]
            if me[2] < 0.1 or right[2] < 0.1 or down[2] < 0.1:
                continue
            n = np.cross(right - me, down - me)
            ln = np.linalg.norm(n)
            if ln == 0:
                continue
            n = n / ln
            view = float(n @ me) / np.linalg.norm(me)
            if -p.max_angle_cos < view < p.max_angle_cos:
                continue
            norms[y, x] = n
    return norms


def huber_plane(nx, ny, nz, nb, points, huber_range):
    """5-iteration Huber GN plane fit (`get_huber_norm`,
    fusion_functions.cpp:104-188), float64."""
    pts = np.array(points, np.float64).reshape(-1, 3)
    mean = pts.mean(axis=0)
    pts = pts - mean
    n = np.array([nx, ny, nz, nb], np.float64)
    for _ in range(5):
        H = np.zeros((4, 4), np.float64)
        J = np.zeros(4, np.float64)
        for q in pts:
            r = q @ n[:3] + n[3]
            a = np.array([q[0], q[1], q[2], 1.0])
            if -huber_range < r < huber_range:
                J += 2 * r * a
                H += 2 * np.outer(a, a)
            elif r >= huber_range:
                J += huber_range * a
            else:
                J += -huber_range * a
        H += 5.0 * np.eye(4)
        n = n - np.linalg.inv(H) @ J
    nb_out = n[3] - n[:3] @ mean
    ln = np.linalg.norm(n[:3])
    return np.concatenate([n[:3] / ln, [nb_out / ln]])


def compute_sp_depth_norms(p: RefParams, seeds: Seeds, image, depth,
                           assignment, space, norms):
    sp = p.sp_size
    for i in range(len(seeds.x)):
        sx, sy = i % p.sp_width, i // p.sp_width
        xb = sx * sp + sp // 2 - sp
        yb = sy * sp + sp // 2 - sp
        pix_depth, pix_norms, pix_pos = [], [], []
        max_dist = 0.0
        for cy in range(yb, yb + 2 * sp):
            for cx_ in range(xb, xb + 2 * sp):
                # the C++ bounds this scan only by flat index (cpp:815-817):
                # the last row/col IS visited; out-of-row wraps can never
                # match the seed id, so full-image masking is equivalent
                if not (0 <= cy < p.height and 0 <= cx_ < p.width):
                    continue
                if assignment[cy, cx_] != i:
                    continue
                dd = (cx_ - seeds.x[i]) ** 2 + (cy - seeds.y[i]) ** 2
                max_dist = max(max_dist, dd)
                if depth[cy, cx_] > 0.05:
                    pix_depth.append(float(depth[cy, cx_]))
                    pix_norms.append(norms[cy, cx_])
                    pix_pos.append(space[cy, cx_])
        if len(pix_depth) < 16:
            continue
        mean_depth = seeds.mean_depth[i]
        acc = np.zeros(3, np.float64)
        inlier_pos = []
        for d, nrm, pos in zip(pix_depth, pix_norms, pix_pos):
            r = mean_depth - d
            if -p.huber_range < r < p.huber_range:
                acc += nrm
                inlier_pos.append(pos)
        if len(inlier_pos) / len(pix_depth) < 0.8:
            continue
        ln = np.linalg.norm(acc)
        if ln == 0:
            continue  # C++ would NaN here; see module docstring
        n0 = acc / ln
        plane = huber_plane(n0[0], n0[1], n0[2], 0.0, inlier_pos,
                            p.huber_range)
        avg = back_project(seeds.x[i], seeds.y[i], mean_depth, p)
        k = -(avg @ plane[:3]) - plane[3]
        avg = avg + k * plane[:3]
        mean_depth = avg[2]
        view_cos = -(plane[:3] @ avg) / np.linalg.norm(avg)
        nvec = plane[:3].copy()
        if view_cos < 0:
            view_cos = -view_cos
            nvec = -nvec
        seeds.norm[i] = nvec
        seeds.pos[i] = avg
        seeds.mean_depth[i] = mean_depth
        seeds.view_cos[i] = view_cos
        seeds.size[i] = np.sqrt(max_dist)


def generate_superpixels(p: RefParams, image, depth):
    seeds = initialize_seeds(p, image, depth)
    assignment = np.zeros((p.height, p.width), np.int64)
    for _ in range(p.iterations):
        assignment = update_pixels(p, seeds, image, depth, assignment)
        update_seeds(p, seeds, image, depth, assignment)
    space = compute_space_map(p, depth)
    norms = compute_pixel_norms(p, space)
    compute_sp_depth_norms(p, seeds, image, depth, assignment, space, norms)
    return seeds, assignment, space, norms


# ---------------------------------------------------------------------------
# surfel fusion oracle
# ---------------------------------------------------------------------------

class RefSurfels:
    """Growable AoS surfel store mirroring SurfelElement (elements.h:22-31)."""

    def __init__(self):
        self.position = np.zeros((0, 3), np.float64)
        self.normal = np.zeros((0, 3), np.float64)
        self.color = np.zeros(0, np.float64)
        self.size = np.zeros(0, np.float64)
        self.weight = np.zeros(0, np.float64)
        self.update_times = np.zeros(0, np.int64)
        self.last_update = np.zeros(0, np.int64)

    def __len__(self):
        return len(self.color)


def fuse_surfels(p: RefParams, surfels: RefSurfels, seeds: Seeds, assignment,
                 depth, pose, frame_index, stale_frames=5, stable_times=5):
    """`fuse_surfels_kernel` oracle (fusion_functions.cpp:190-313)."""
    inv_pose = np.linalg.inv(pose)
    cam_f = (abs(p.fx) + abs(p.fy)) / 2.0
    for i in range(len(surfels)):
        if (frame_index - surfels.last_update[i] > stale_frames
                and surfels.update_times[i] < stable_times):
            surfels.update_times[i] = 0
            continue
        if surfels.update_times[i] == 0:
            continue
        p_c = inv_pose[:3, :3] @ surfels.position[i] + inv_pose[:3, 3]
        if p_c[2] < p.fuse_near or p_c[2] > p.fuse_far:
            continue
        n_c = inv_pose[:3, :3] @ surfels.normal[i]
        u = p_c[0] * p.fx / p_c[2] + p.cx
        v = p_c[1] * p.fy / p_c[2] + p.cy
        pu, pv = int(u + 0.5), int(v + 0.5)
        if pu < 1 or pu > p.width - 2 or pv < 1 or pv > p.height - 2:
            continue
        if p_c[2] < depth[pv, pu] - 1.0:
            surfels.update_times[i] = 0
            continue
        si = assignment[pv, pu]
        if si < 0 or not seeds.norm[si].any():
            continue
        if seeds.view_cos[si] < p.max_angle_cos:
            continue
        tol = p_c[2] ** 2 / (p.baseline * cam_f) * p.disparity_error
        tol = max(tol, p.min_tolerate_diff)
        if not (seeds.mean_depth[si] - tol <= p_c[2] <= seeds.mean_depth[si] + tol):
            continue
        ncos = n_c @ seeds.norm[si]
        if ncos < p.max_angle_cos:
            surfels.update_times[i] = 0
            continue
        w_old = surfels.weight[i]
        w_new = min(1.0 / seeds.mean_depth[si] ** 2, 1.0)
        w_sum = w_old + w_new
        sp_w = pose[:3, :3] @ seeds.pos[si] + pose[:3, 3]
        surfels.position[i] = (surfels.position[i] * w_old + w_new * sp_w) / w_sum
        fn = n_c * w_old + w_new * seeds.norm[si]
        fn = fn / np.linalg.norm(fn)
        surfels.normal[i] = pose[:3, :3] @ fn
        surfels.weight[i] = w_sum
        surfels.color[i] = seeds.mean_intensity[si]
        new_size = seeds.size[si] * abs(
            seeds.mean_depth[si] / (cam_f * seeds.view_cos[si]))
        if new_size < surfels.size[i]:
            surfels.size[i] = new_size
        surfels.last_update[i] = frame_index
        surfels.update_times[i] += 1
        seeds.fused[si] = True


def initialize_surfels(p: RefParams, seeds: Seeds, pose, frame_index):
    """`initialize_surfels` oracle (fusion_functions.cpp:315-361).
    Returns list of dicts (world-frame new surfels)."""
    cam_f = (abs(p.fx) + abs(p.fy)) / 2.0
    out = []
    for i in range(len(seeds.x)):
        if seeds.mean_depth[i] == 0 or seeds.fused[i]:
            continue
        if seeds.view_cos[i] < p.max_angle_cos:
            continue
        if not seeds.norm[i].any():
            continue
        pos_w = pose[:3, :3] @ seeds.pos[i] + pose[:3, 3]
        norm_w = pose[:3, :3] @ seeds.norm[i]
        size = seeds.size[i] * abs(
            seeds.mean_depth[i] / (cam_f * seeds.view_cos[i]))
        out.append(dict(position=pos_w, normal=norm_w,
                        color=seeds.mean_intensity[i], size=size,
                        weight=min(1.0 / seeds.mean_depth[i] ** 2, 1.0),
                        update_times=1, last_update=frame_index))
    return out
