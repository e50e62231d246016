"""Tests for the visualization module and the CLI replay runner."""

import json
import os
import zlib

import numpy as np
import pytest

from densesurfelmapping_tpu import viz
from densesurfelmapping_tpu.config import (SurfelMapConfig, CameraIntrinsics,
                                           KITTI_00_INTRINSICS)


SMALL_CAM = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                             cx=59.5, cy=27.5)


def test_frustum_geometry():
    pose = np.eye(4)
    pose[:3, 3] = (1.0, 2.0, 3.0)
    verts, edges = viz.camera_frustum_lines(pose, KITTI_00_INTRINSICS,
                                            scale=2.0)
    assert verts.shape == (5, 3) and edges.shape == (8, 2)
    np.testing.assert_allclose(verts[0], (1, 2, 3), atol=1e-6)  # apex at t
    # image-plane corners sit at depth scale in the camera frame
    np.testing.assert_allclose(verts[1:, 2] - 3.0, 2.0, atol=1e-5)


def test_pose_graph_lines_and_ply(tmp_path):
    poses = [np.eye(4) for _ in range(4)]
    for i, p in enumerate(poses):
        p[:3, 3] = (i, 0, 0)
    pts, path, loops = viz.pose_graph_lines(poses, [(0, 3), (0, 99)])
    assert len(pts) == 4 and len(path) == 3
    assert len(loops) == 1  # out-of-range edge dropped
    out = tmp_path / "cams.ply"
    viz.save_camera_markers(str(out), poses, SMALL_CAM, loop_edges=[(0, 3)])
    text = out.read_text()
    assert "element vertex 24" in text          # 4 frustums x5 + 4 path pts
    assert "element edge" in text


def test_render_segmentation_and_png(tmp_path):
    cfg = SurfelMapConfig(camera=SMALL_CAM, surfel_capacity=1024)
    h, w = cfg.padded_height, cfg.padded_width
    img = np.full((h, w), 100.0, np.float32)
    asg = np.zeros((h, w), np.int32)
    asg[:, cfg.width // 2:] = 1
    rgb = viz.render_segmentation(cfg, img, asg)
    assert rgb.shape == (cfg.height, cfg.width, 3)
    assert (rgb[:, cfg.width // 2] == (255, 64, 64)).all()  # boundary marked

    png = tmp_path / "seg.png"
    viz.save_png(str(png), rgb)
    data = png.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # decode the IDAT and check round-trip of the first row
    idat_ofs = data.index(b"IDAT") + 4
    idat_len = int.from_bytes(data[idat_ofs - 8:idat_ofs - 4], "big")
    raw = zlib.decompress(data[idat_ofs:idat_ofs + idat_len])
    row0 = np.frombuffer(raw[1:1 + cfg.width * 3], np.uint8).reshape(-1, 3)
    np.testing.assert_array_equal(row0, rgb[0])

    dm = viz.depth_colormap(np.array([[0.0, 15.0, 30.0]]))
    assert (dm[0, 0] == 0).all() and dm.shape == (1, 3, 3)


def test_cli_synthetic_end_to_end(tmp_path):
    from densesurfelmapping_tpu.cli import main

    cam_json = tmp_path / "cam.json"
    cfg = SurfelMapConfig(camera=SMALL_CAM, surfel_capacity=8192)
    cam_json.write_text(cfg.to_json())
    out = str(tmp_path / "map")
    rc = main(["synthetic", "--frames", "6", "--out", out,
               "--camera-json", str(cam_json), "--kf-every", "2"])
    assert rc == 0
    for suffix in (".pcd", "_mesh.ply", "_cameras.ply", ".ckpt.npz",
                   "_seg.png", "_mapdepth.png"):
        assert os.path.exists(out + suffix), f"missing {out + suffix}"
    # checkpoint is loadable and non-trivial
    z = np.load(out + ".ckpt.npz")
    assert int(z["bank_count"]) > 0
    assert len(z["kf_cam"]) == 3


def test_cli_tum_end_to_end(tmp_path):
    """Generated TUM dataset through the tum subcommand (rgbd profile)."""
    import numpy as np
    from PIL import Image
    from densesurfelmapping_tpu.cli import main
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics

    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, dep_lines, gt_lines = [], [], []
    rng = np.random.default_rng(1)
    h, w = 48, 64
    for i in range(4):
        t = 10.0 + i * 0.1
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(img).save(root / "rgb" / f"{t:.6f}.png")
        dep = np.full((h, w), int(1.5 * 5000), np.uint16)
        Image.fromarray(dep).save(root / "depth" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        dep_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t:.6f} {0.02*i:.3f} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(dep_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

    cam = SurfelMapConfig(
        camera=CameraIntrinsics(width=w, height=h, fx=60.0, fy=60.0,
                                cx=31.5, cy=23.5),
        surfel_capacity=8192, fuse_near=0.1, fuse_far=5.0)
    cam_json = tmp_path / "cam.json"
    cam_json.write_text(cam.to_json())

    out = str(tmp_path / "tum_map")
    rc = main(["tum", "--root", str(root), "--out", out,
               "--camera-json", str(cam_json)])
    assert rc == 0
    import os
    assert os.path.exists(out + ".pcd")


def test_cli_multi_session(tmp_path):
    from densesurfelmapping_tpu.cli import main
    cam_json = tmp_path / "cam.json"
    cfg = SurfelMapConfig(camera=SMALL_CAM, surfel_capacity=8192)
    cam_json.write_text(cfg.to_json())
    out = str(tmp_path / "multi")
    rc = main(["multi", "--streams", "2", "--frames", "4",
               "--camera-json", str(cam_json), "--out", out,
               "--kf-every", "2"])
    assert rc == 0
    import os
    assert os.path.exists(out + "_s0.pcd") and os.path.exists(out + "_s1.pcd")


def test_cli_host_pool_flag(tmp_path):
    """--host-pool selects the migration driver; outputs still produced."""
    from densesurfelmapping_tpu.cli import main

    cam_json = tmp_path / "cam.json"
    cfg = SurfelMapConfig(camera=SMALL_CAM, surfel_capacity=8192)
    cam_json.write_text(cfg.to_json())
    out = str(tmp_path / "hp")
    rc = main(["synthetic", "--frames", "4", "--out", out, "--host-pool",
               "--camera-json", str(cam_json), "--kf-every", "2"])
    assert rc == 0
    import os
    assert os.path.exists(out + ".pcd")
