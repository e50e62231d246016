"""Synthetic KITTI-layout fixtures through the loader and the kitti CLI.

The reference's KITTI data path (`kitti_publisher/scripts/publisher.py:30-64`)
could never be exercised in this image (no dataset on disk); this generates
a bit-faithful layout — gray PNGs in image_0/image_1, PSMNet-style
disparity .npy in depth_0, poses.txt 3x4 rows — from the synthetic scene,
so the loader math (depth = bf/disparity, per-seq bf constants), pose
parsing, and the full `kitti` CLI replay (depth-fed and stereo-resident)
run end-to-end."""

import os

import numpy as np
import pytest

from densesurfelmapping_tpu import viz
from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.io import synthetic
from densesurfelmapping_tpu.io.kitti import (BF_SEQ_00_02, BF_SEQ_04_12,
                                             KittiSequence, bf_for_sequence,
                                             load_kitti_poses)

CAM = CameraIntrinsics(width=64, height=48, fx=60.0, fy=60.0,
                       cx=31.5, cy=23.5)
N = 6


def make_kitti_tree(root, stereo_baseline=0.0):
    """Write a KITTI-layout sequence rendered from the synthetic scene.
    Disparities are synthesized as bf/depth so the loader reconstructs the
    rendered depth exactly (modulo f32)."""
    cfg = SurfelMapConfig(camera=CAM, surfel_capacity=8192, lane_align=8)
    scene = synthetic.default_scene()
    poses = synthetic.forward_trajectory(N, step=0.3)
    for d in ("image_0", "image_1", "depth_0"):
        (root / d).mkdir(parents=True, exist_ok=True)
    depths, rows = [], []
    for i, pose in enumerate(poses):
        img, dep = scene.render(cfg, pose)
        viz.save_png(str(root / "image_0" / f"{i:06d}.png"),
                     np.clip(img, 0, 255).astype(np.uint8))
        if stereo_baseline:
            rp = np.array(pose)
            rp[:3, 3] += pose[:3, 0] * stereo_baseline   # camera +x shift
            rimg, _ = scene.render(cfg, rp)
        else:
            rimg = img
        viz.save_png(str(root / "image_1" / f"{i:06d}.png"),
                     np.clip(rimg, 0, 255).astype(np.uint8))
        disp = np.where(dep > 0, BF_SEQ_00_02 / np.maximum(dep, 1e-6), 0.0)
        np.save(root / "depth_0" / f"{i:06d}.npy", disp.astype(np.float32))
        depths.append(dep)
        rows.append(np.asarray(pose, np.float64)[:3, :].reshape(-1))
    np.savetxt(root / "poses.txt", np.array(rows))
    return cfg, poses, depths


def test_bf_constants():
    # publisher.py:40-41 — per-sequence-group baseline*focal
    assert bf_for_sequence(0) == bf_for_sequence(2) == BF_SEQ_00_02
    assert bf_for_sequence(4) == bf_for_sequence(12) == BF_SEQ_04_12


def test_loader_roundtrip(tmp_path):
    cfg, poses, depths = make_kitti_tree(tmp_path)
    seq = KittiSequence(str(tmp_path), seq=0, rate_hz=5.0)
    frames = list(seq)
    assert len(frames) == N
    for i, fr in enumerate(frames):
        assert fr.stamp == pytest.approx(i / 5.0)
        assert fr.image.dtype == np.uint8
        # depth = bf / (bf / depth_true) round-trips within f32
        valid = depths[i] > 0
        np.testing.assert_allclose(fr.depth[valid], depths[i][valid],
                                   rtol=1e-4)
        assert (fr.depth[~valid] == 0).all()
        np.testing.assert_allclose(fr.pose, poses[i], atol=1e-9)
    # max_frames truncates; missing files end the stream cleanly
    assert len(list(KittiSequence(str(tmp_path), max_frames=3))) == 3


def test_poses_parse(tmp_path):
    make_kitti_tree(tmp_path)
    p = load_kitti_poses(str(tmp_path / "poses.txt"))
    assert p.shape == (N, 4, 4)
    np.testing.assert_array_equal(p[:, 3], np.tile((0, 0, 0, 1), (N, 1)))


def test_kitti_cli_end_to_end(tmp_path):
    """Full depth-fed replay: loader -> driver -> exports, map matches the
    rendered inputs."""
    from densesurfelmapping_tpu.cli import main

    root = tmp_path / "seq"
    cfg, _, _ = make_kitti_tree(root)
    cam_json = tmp_path / "cam.json"
    cam_json.write_text(cfg.to_json())
    out = str(tmp_path / "map")
    rc = main(["kitti", "--root", str(root), "--seq", "0",
               "--camera-json", str(cam_json), "--out", out,
               "--kf-every", "2"])
    assert rc == 0
    for suffix in (".pcd", "_mesh.ply", ".ckpt.npz", "_seg.png"):
        assert os.path.exists(out + suffix), f"missing {out + suffix}"
    z = np.load(out + ".ckpt.npz")
    assert int(z["bank_count"]) > 0
    assert len(z["kf_cam"]) == N // 2
    assert np.isfinite(z["bank_position"]).all()


def test_kitti_cli_stereo_smoke(tmp_path):
    """Stereo-resident replay: depth computed on-device from the rendered
    image_0/image_1 pair (baseline chosen so fx*b = the seq-00 bf constant
    the CLI passes to the matcher)."""
    from densesurfelmapping_tpu.cli import main

    root = tmp_path / "seq"
    cfg, _, _ = make_kitti_tree(root, stereo_baseline=BF_SEQ_00_02 / CAM.fx)
    cam_json = tmp_path / "cam.json"
    cam_json.write_text(cfg.to_json())
    out = str(tmp_path / "smap")
    rc = main(["kitti", "--root", str(root), "--seq", "0",
               "--camera-json", str(cam_json), "--out", out,
               "--kf-every", "2", "--stereo", "--max-disparity", "32"])
    assert rc == 0
    assert os.path.exists(out + ".ckpt.npz")
    z = np.load(out + ".ckpt.npz")
    assert np.isfinite(z["bank_position"]).all()
