"""IO layer tests: exporters (native + python fallback), pose feed,
synthetic renderer, end-to-end driver export."""

import numpy as np
import pytest

from densesurfelmapping_tpu.io import export, posefeed, synthetic
from densesurfelmapping_tpu.native import loader as native
from densesurfelmapping_tpu.core import geometry

from test_driver import tiny_config, render_plane, feed_frame
from densesurfelmapping_tpu.pipeline.driver import SurfelMapping


def sample_surfels(n=10, seed=0):
    rng = np.random.default_rng(seed)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return dict(position=rng.normal(size=(n, 3)).astype(np.float32),
                normal=nrm.astype(np.float32),
                color=rng.uniform(0, 255, n).astype(np.float32),
                size=rng.uniform(0.01, 0.1, n).astype(np.float32),
                weight=np.ones(n, np.float32),
                update_times=np.full(n, 6, np.int32),
                last_update=np.zeros(n, np.int32))


def test_hexagon_geometry():
    s = sample_surfels(5)
    verts = export.hexagon_vertices(s["position"], s["normal"], s["size"])
    assert verts.shape == (5, 6, 3)
    # all corners lie in the surfel tangent plane
    for i in range(5):
        d = verts[i] - s["position"][i]
        dots = d @ s["normal"][i]
        np.testing.assert_allclose(dots, 0, atol=1e-5)
        # corner radii: 4 at r, 2 at... corners 3/4 at exactly r
        r = np.linalg.norm(d, axis=1)
        np.testing.assert_allclose(r[2], s["size"][i], rtol=1e-4)
        np.testing.assert_allclose(r[3], s["size"][i], rtol=1e-4)


@pytest.mark.parametrize("binary", [False, True])
def test_ply_roundtrip(tmp_path, binary):
    s = sample_surfels(20)
    path = str(tmp_path / f"mesh_{binary}.ply")
    n = export.save_mesh_ply(path, s, binary=binary)
    assert n == 20
    verts = export.load_ply_vertices(path)
    assert verts.shape == (120, 3)
    expect = export.hexagon_vertices(s["position"], s["normal"],
                                     s["size"]).reshape(-1, 3)
    np.testing.assert_allclose(verts, expect, atol=1e-4)


def test_pcd_write(tmp_path):
    s = sample_surfels(15)
    path = str(tmp_path / "cloud.pcd")
    n = export.save_cloud_pcd(path, s, binary=True)
    assert n == 15
    raw = open(path, "rb").read()
    header, data = raw.split(b"DATA binary\n")
    pts = np.frombuffer(data, "<f4").reshape(-1, 4)
    np.testing.assert_allclose(pts[:, :3], s["position"], atol=1e-6)
    np.testing.assert_allclose(pts[:, 3], s["color"], atol=1e-4)


def test_native_vs_python_ply(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    s = sample_surfels(8)
    p_native = str(tmp_path / "n.ply")
    p_python = str(tmp_path / "p.ply")
    export.save_mesh_ply(p_native, s, binary=True)
    verts = export.hexagon_vertices(s["position"], s["normal"], s["size"])
    colors = np.repeat(np.clip(s["color"], 0, 255).astype(np.uint8), 6)
    faces = (export.HEX_FACES[None] + 6 * np.arange(8)[:, None, None]
             ).reshape(-1, 3)
    export._write_ply_python(p_python, verts.reshape(-1, 3), colors, faces,
                             binary=True)
    np.testing.assert_array_equal(export.load_ply_vertices(p_native),
                                  export.load_ply_vertices(p_python))


def test_native_bfs():
    if not native.available():
        pytest.skip("no native toolchain")
    # chain 0-1-2-3-4 with loop 4-0, CSR
    adj = {0: [1, 4], 1: [0, 2], 2: [1, 3], 3: [2, 4], 4: [3, 0]}
    indptr = np.cumsum([0] + [len(adj[i]) for i in range(5)])
    indices = np.concatenate([adj[i] for i in range(5)])
    out = native.bfs(indptr, indices, root=4, radius=2)
    assert list(out) == [4, 3, 0]
    out = native.bfs(indptr, indices, root=4, radius=3)
    assert set(out) == {4, 3, 0, 2, 1}


def test_posefeed_roundtrip(tmp_path):
    poses = synthetic.forward_trajectory(7, step=0.3)
    msgs = []
    for i, p in enumerate(poses):
        msgs.append(posefeed.PoseMessage(
            stamp=float(i), pose=p, is_keyframe=(i % 2 == 0),
            reference_index=i // 2,
            loop_path=[poses[j] for j in range(i // 2 + 1)] if i > 3 else None,
            loop_edges=[(i // 2, 0)] if i == 6 else []))
    path = str(tmp_path / "feed.npz")
    posefeed.PoseFeed.save(path, msgs)
    feed = posefeed.PoseFeed.load(path)
    assert len(feed) == 7
    for a, b in zip(msgs, feed):
        assert a.stamp == b.stamp
        np.testing.assert_allclose(a.pose, b.pose)
        assert a.is_keyframe == b.is_keyframe
        assert a.reference_index == b.reference_index
        assert a.loop_edges == b.loop_edges
        if a.loop_path is None:
            assert b.loop_path is None
        else:
            np.testing.assert_allclose(np.stack(a.loop_path),
                                       np.stack(b.loop_path))


def test_tum_feed(tmp_path):
    path = str(tmp_path / "traj.txt")
    with open(path, "w") as f:
        f.write("# comment\n")
        for i in range(5):
            f.write(f"{i * 0.1} {i * 0.5} 0 0 0 0 0 1\n")
    feed = posefeed.PoseFeed.from_tum(path, keyframe_every=2)
    assert len(feed) == 5
    assert [m.is_keyframe for m in feed] == [True, False, True, False, True]
    np.testing.assert_allclose(feed.messages[3].pose[0, 3], 1.5)


def test_synthetic_scene_consistency():
    cfg = tiny_config()
    scene = synthetic.default_scene()
    pose = np.eye(4)
    img, dep = scene.render(cfg, pose)
    assert img.shape == (cfg.height, cfg.width)
    # ground plane: pixels looking down should hit y=1.5
    cam = cfg.camera
    v = cfg.height - 5
    ydir = (v - cam.cy) / cam.fy
    expect = 1.5 / ydir
    got = dep[v, int(cam.cx)]
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # reproducibility
    img2, dep2 = scene.render(cfg, pose)
    np.testing.assert_array_equal(dep, dep2)


def test_driver_export_end_to_end(tmp_path):
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    for i in range(4):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    mesh_path = str(tmp_path / "map.ply")
    cloud_path = str(tmp_path / "map.pcd")
    n_mesh = m.save_mesh(mesh_path)
    n_cloud = m.save_cloud(cloud_path)
    assert n_mesh > 0 and n_cloud > 0
    verts = export.load_ply_vertices(mesh_path)
    assert len(verts) == 6 * n_mesh
    # mesh vertices must lie near the mapped plane z=4
    assert abs(np.median(verts[:, 2]) - 4.0) < 0.1


def test_tum_sequence(tmp_path):
    """Generated TUM-layout dataset: association, depth scale, pose lookup."""
    import numpy as np
    from PIL import Image
    from densesurfelmapping_tpu.io.tum import TumSequence, associate

    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, dep_lines, gt_lines = [], [], []
    rng = np.random.default_rng(0)
    for i in range(4):
        t_rgb = 100.0 + i * 0.033
        t_dep = t_rgb + 0.004            # slightly offset depth stream
        img = rng.integers(0, 255, (48, 64, 3), np.uint8)
        Image.fromarray(img).save(root / "rgb" / f"{t_rgb:.6f}.png")
        dep = np.full((48, 64), 2.5 * 5000, np.uint16)   # 2.5 m
        dep[0, 0] = 0                                     # invalid px
        Image.fromarray(dep).save(root / "depth" / f"{t_dep:.6f}.png")
        rgb_lines.append(f"{t_rgb:.6f} rgb/{t_rgb:.6f}.png")
        dep_lines.append(f"{t_dep:.6f} depth/{t_dep:.6f}.png")
        gt_lines.append(f"{t_rgb:.6f} {0.1*i:.3f} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# d\n" + "\n".join(dep_lines) + "\n")
    (root / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")

    seq = TumSequence(str(root))
    frames = list(seq)
    assert len(frames) == 4
    f = frames[1]
    assert f.image.shape == (48, 64) and f.depth.shape == (48, 64)
    assert f.depth[5, 5] == pytest.approx(2.5)
    assert f.depth[0, 0] == 0.0
    assert f.pose is not None
    assert f.pose[0, 3] == pytest.approx(0.1)

    # association rejects out-of-tolerance stamps
    pairs = associate([(0.0, "a")], [(1.0, "b")], tolerance=0.02)
    assert pairs == []


def test_native_pack_frame_matches_numpy():
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.core.state import pack_frame, compact_frame
    from densesurfelmapping_tpu.native import loader as native

    if not native.available():
        pytest.skip("native library unavailable")
    cam = CameraIntrinsics(width=64, height=48, fx=60.0, fy=60.0,
                           cx=31.5, cy=23.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=256)
    rng = np.random.default_rng(0)
    img = (rng.uniform(-10, 280, (48, 64))).astype(np.float32)
    dep = (rng.uniform(0, 40, (48, 64))).astype(np.float32)
    dep[0, 0] = np.inf

    got = pack_frame(cfg, img, dep)          # native path (f32 inputs)
    ci, cd = compact_frame(cfg, img, dep)    # numpy path
    want = np.concatenate([ci.reshape(-1), cd.reshape(-1).view(np.uint8)])
    np.testing.assert_array_equal(got, want)


def test_trajectory_export_roundtrip(tmp_path):
    """KITTI and TUM trajectory writers: parse back and recover the poses."""
    import numpy as np
    from densesurfelmapping_tpu.io import export

    rng = np.random.RandomState(5)
    poses, stamps = [], []
    for i in range(6):
        # random valid SE3
        a = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(a)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        p = np.eye(4)
        p[:3, :3] = q
        p[:3, 3] = rng.normal(size=3) * 5
        poses.append(p)
        stamps.append(0.1 * i)

    kp = tmp_path / "traj_kitti.txt"
    assert export.save_trajectory_kitti(str(kp), poses, stamps) == 6
    rows = np.loadtxt(str(kp))
    assert rows.shape == (6, 12)
    for i, p in enumerate(poses):
        np.testing.assert_allclose(rows[i].reshape(3, 4), p[:3, :4],
                                   atol=1e-8)

    tp = tmp_path / "traj_tum.txt"
    assert export.save_trajectory_tum(str(tp), poses, stamps) == 6
    rows = np.loadtxt(str(tp))
    assert rows.shape == (6, 8)
    for i, p in enumerate(poses):
        np.testing.assert_allclose(rows[i][1:4], p[:3, 3], atol=1e-8)
        x, y, z, w = rows[i][4:8]
        # rebuild the rotation from the quaternion and compare
        R = np.array([
            [1 - 2*(y*y + z*z), 2*(x*y - w*z), 2*(x*z + w*y)],
            [2*(x*y + w*z), 1 - 2*(x*x + z*z), 2*(y*z - w*x)],
            [2*(x*z - w*y), 2*(y*z + w*x), 1 - 2*(x*x + y*y)]])
        np.testing.assert_allclose(R, p[:3, :3], atol=1e-7)
        assert abs(rows[i][0] - stamps[i]) < 1e-9


def test_driver_save_trajectory(tmp_path):
    import numpy as np
    from test_driver import tiny_config, render_plane, feed_frame
    from densesurfelmapping_tpu.pipeline.driver import SurfelMapping

    cfg = tiny_config()
    m = SurfelMapping(cfg)
    for i in range(3):
        pose = np.eye(4)
        pose[0, 3] = 0.3 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    out = tmp_path / "t.txt"
    assert m.save_trajectory(str(out)) == 3
    rows = np.loadtxt(str(out))
    np.testing.assert_allclose(rows[2].reshape(3, 4)[:, 3][:1], [0.6],
                               atol=1e-8)
