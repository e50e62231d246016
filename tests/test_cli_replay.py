"""End-to-end CLI tests: kitti and replay subcommands on generated data."""

import os

import numpy as np
import pytest
from PIL import Image

from densesurfelmapping_tpu.cli import main
from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.io.posefeed import PoseFeed, PoseMessage


CAM = CameraIntrinsics(width=64, height=48, fx=60.0, fy=60.0,
                       cx=31.5, cy=23.5)


def make_kitti_root(tmp_path, n=4, with_right=False):
    """Tiny KITTI-layout dataset: textured PNGs + constant-disparity npy."""
    root = tmp_path / "kitti"
    (root / "image_0").mkdir(parents=True)
    (root / "depth_0").mkdir()
    if with_right:
        (root / "image_1").mkdir()
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n):
        img = rng.integers(0, 255, (CAM.height, CAM.width), np.uint8)
        Image.fromarray(img).save(root / "image_0" / f"{i:06d}.png")
        if with_right:
            Image.fromarray(img).save(root / "image_1" / f"{i:06d}.png")
        # disparity such that depth = bf/disp ~ 4 m
        disp = np.full((CAM.height, CAM.width), 386.1448 / 4.0, np.float32)
        np.save(root / "depth_0" / f"{i:06d}.npy", disp)
        pose = np.eye(4)
        pose[0, 3] = 0.1 * i
        poses.append(pose)
    lines = [" ".join(f"{v:.6f}" for v in p[:3].reshape(-1)) for p in poses]
    (root / "poses.txt").write_text("\n".join(lines) + "\n")
    return root, poses


def cam_json(tmp_path):
    cfg = SurfelMapConfig(camera=CAM, surfel_capacity=8192,
                          fuse_near=0.3, fuse_far=10.0)
    p = tmp_path / "cam.json"
    p.write_text(cfg.to_json())
    return str(p)


def test_cli_kitti_end_to_end(tmp_path):
    root, _ = make_kitti_root(tmp_path)
    out = str(tmp_path / "k")
    rc = main(["kitti", "--root", str(root), "--out", out,
               "--camera-json", cam_json(tmp_path)])
    assert rc == 0
    assert os.path.exists(out + ".pcd")
    assert os.path.exists(out + "_mesh.ply")


def test_cli_replay_with_loop_edges(tmp_path):
    root, poses = make_kitti_root(tmp_path, n=5)
    # recorded SLAM feed: keyframes every frame, one loop edge, one
    # pose-graph correction on the final message
    shift = np.eye(4)
    shift[1, 3] = 0.25
    msgs = []
    for i, pose in enumerate(poses):
        loop_path = None
        edges = []
        if i == 4:
            loop_path = [shift @ p for p in poses[:4]] + [shift @ pose]
            edges = [(4, 0)]
        msgs.append(PoseMessage(stamp=i / 5.0, pose=pose, is_keyframe=True,
                                reference_index=i, loop_path=loop_path,
                                loop_edges=edges))
    feed_path = str(tmp_path / "feed.npz")
    PoseFeed.save(feed_path, msgs)

    out = str(tmp_path / "r")
    rc = main(["replay", "--feed", feed_path, "--root", str(root),
               "--out", out, "--camera-json", cam_json(tmp_path)])
    assert rc == 0
    assert os.path.exists(out + ".ckpt.npz")
    z = np.load(out + ".ckpt.npz")
    assert int(z["bank_count"]) > 0
    assert len(z["kf_cam"]) == 5
    # the loop edge made it into the graph
    edges = set(map(tuple, z["kf_edges"]))
    assert (4, 0) in edges or (0, 4) in edges


def test_cli_kitti_stereo_mode(tmp_path):
    """--stereo computes depth on-device from image_0/image_1."""
    from densesurfelmapping_tpu.io import synthetic

    cfg = SurfelMapConfig(camera=CAM, surfel_capacity=8192,
                          fuse_near=0.3, fuse_far=12.0)
    # wall at 9 m -> disparity bf/9 = 42.9 px, inside the 48-disparity range
    scene = synthetic.Scene(ground_y=1.5, wall_z=9.0, boxes=[],
                            max_depth=11.5, texture="multisine")
    baseline = 386.1448 / CAM.fx   # so bf == the seq-00 constant
    root = tmp_path / "kitti"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    poses = []
    for i in range(3):
        lp = np.eye(4)
        lp[0, 3] = 0.05 * i
        rp = lp.copy()
        rp[0, 3] += baseline
        li, _ = scene.render(cfg, lp)
        ri, _ = scene.render(cfg, rp)
        Image.fromarray(li.astype(np.uint8)).save(
            root / "image_0" / f"{i:06d}.png")
        Image.fromarray(ri.astype(np.uint8)).save(
            root / "image_1" / f"{i:06d}.png")
        poses.append(lp)
    lines = [" ".join(f"{v:.6f}" for v in p[:3].reshape(-1)) for p in poses]
    (root / "poses.txt").write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "s")
    rc = main(["kitti", "--root", str(root), "--stereo",
               "--max-disparity", "48", "--out", out,
               "--camera-json", cam_json(tmp_path)])
    assert rc == 0
    ckpt = np.load(out + ".ckpt.npz")
    # the wall at 9 m must have produced real surfels from matched depth
    # (the 64x48 frame has only ~48 seeds; stereo holes cost some)
    assert int(ckpt["bank_count"]) > 10
    z = ckpt["bank_position"][:, 2]
    ut = ckpt["bank_update_times"]
    wallish = np.abs(z[ut > 0] - 9.0) < 0.5
    assert wallish.mean() > 0.3


def test_diagnose_subcommand_registered(capsys):
    import pytest
    from densesurfelmapping_tpu.cli import main
    with pytest.raises(SystemExit) as e:
        main(["diagnose", "--help"])
    assert e.value.code == 0
    assert "fuse-frames" in capsys.readouterr().out


def test_cli_stress_stereo_smoke(tmp_path):
    """stress --stereo: the loop-closure stress feed runs end-to-end with
    the stereo-resident front-end."""
    out = str(tmp_path / "ss")
    rc = main(["stress", "--frames", "24", "--stereo", "--kf-every", "2",
               "--radius", "6", "--out", out,
               "--camera-json", cam_json(tmp_path)])
    assert rc == 0
    ckpt = np.load(out + ".ckpt.npz")
    assert int(ckpt["bank_count"]) > 10


def test_stereo_config_flag_threading():
    """Every stereo knob reaches StereoConfig from any subcommand's args
    (ADVICE r3 pattern: no flag may silently apply only on one
    subcommand), and the measured round-4 defaults hold: post_median ON,
    occlusion_fill OFF, hierarchical OFF."""
    from argparse import Namespace
    from densesurfelmapping_tpu.cli import _stereo_config

    c = _stereo_config(Namespace(sgm=True, no_post_median=True,
                                 occlusion_fill=True, hier=True,
                                 max_disparity=64))
    assert c.aggregation == "sgm" and not c.post_median
    assert c.occlusion_fill and c.hierarchical and c.max_disparity == 64

    d = _stereo_config(Namespace())
    assert d.aggregation == "box" and d.post_median
    assert not d.occlusion_fill and not d.hierarchical
