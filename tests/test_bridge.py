"""Live ingestion bridge tests: wire round-trip, two-"process" equivalence
against the in-process driver, queue-overflow semantics, control requests,
reconnect-into-live-map.

The bridge (io/bridge.py) is the rebuild's equivalent of the reference's
live ROS topology (`ros_node.cpp:24-32` decoupling queues); these tests run
server and client in threads over loopback TCP — same bytes on the wire as
the real two-process deployment.
"""

import socket
import threading
import time

import numpy as np
import pytest

from densesurfelmapping_tpu.io import bridge
from densesurfelmapping_tpu.pipeline.driver import SurfelMapping

from test_driver import tiny_config, render_plane, feed_frame


def _serve_in_thread(server):
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t


def _stream(client, cfg, n_frames, kf_every=2):
    """Stream n translated plane views; returns the frames fed."""
    fed = []
    for i in range(n_frames):
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        img, dep = render_plane(cfg, pose)
        client.publish_pose(float(i), pose, is_keyframe=(i % kf_every == 0))
        client.publish_image(float(i), img)
        client.publish_depth(float(i), dep)
        fed.append((pose, img, dep))
    return fed


# ---------------------------------------------------------------------------
def test_wire_roundtrip_arrays():
    a, b = socket.socketpair()
    payload = bridge._pack_arrays(
        stamp=np.float64(1.5), image=np.arange(12, dtype=np.uint8).reshape(3, 4))
    bridge._send_msg(a, bridge.T_IMAGE, payload)
    mtype, got = bridge._recv_msg(b)
    assert mtype == bridge.T_IMAGE
    arrays = bridge._unpack_arrays(got)
    assert float(arrays["stamp"]) == 1.5
    np.testing.assert_array_equal(
        arrays["image"], np.arange(12, dtype=np.uint8).reshape(3, 4))
    a.close(), b.close()


def test_bridge_matches_inprocess_driver():
    """The map built over the socket equals the map built by direct feeds —
    the bridge adds transport, not semantics."""
    cfg = tiny_config()
    n = 6

    # in-process reference run
    direct = SurfelMapping(cfg)
    for i in range(n):
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(direct, float(i), pose, img, dep, is_keyframe=(i % 2 == 0))

    served = SurfelMapping(cfg)
    with bridge.MappingServer(served, ("127.0.0.1", 0)) as server:
        _serve_in_thread(server)
        with bridge.MappingClient(tuple(server.address)) as client:
            _stream(client, cfg, n)
            m = client.metrics()["metrics"]

    assert m["bridge_frames"] == n and m["bridge_poses"] == n
    assert m["frames_fused"] == direct.frames_fused == n
    da, sa = direct.active_surfels(), served.active_surfels()
    assert da["position"].shape == sa["position"].shape
    # identical inputs through identical jits -> identical surfels
    np.testing.assert_allclose(
        np.sort(da["position"], axis=0), np.sort(sa["position"], axis=0),
        atol=1e-6)


def test_control_save_and_metrics(tmp_path):
    cfg = tiny_config()
    served = SurfelMapping(cfg)
    with bridge.MappingServer(served, ("127.0.0.1", 0)) as server:
        _serve_in_thread(server)
        with bridge.MappingClient(tuple(server.address)) as client:
            _stream(client, cfg, 8)  # >5 updates -> stable (mesh-eligible)
            mesh = tmp_path / "live_mesh.ply"
            r = client.save_map(str(mesh), what="mesh")
            assert r["ok"] and mesh.exists() and r["count"] > 0
            ck = tmp_path / "live.ckpt.npz"
            r = client.save_map(str(ck), what="checkpoint")
            assert r["ok"] and ck.exists()
            r = client.shutdown()
            assert r["ok"] and r["stats"]["frames"] == 8

    # checkpoint round-trips into a fresh driver
    resumed = SurfelMapping(cfg)
    resumed.load_checkpoint(str(ck))
    assert resumed.frames_fused == served.frames_fused


def test_save_error_reported_not_fatal(tmp_path):
    cfg = tiny_config()
    with bridge.MappingServer(SurfelMapping(cfg), ("127.0.0.1", 0)) as server:
        _serve_in_thread(server)
        with bridge.MappingClient(tuple(server.address)) as client:
            _stream(client, cfg, 2)
            with pytest.raises(RuntimeError):
                client.save_map("/nonexistent-dir/x.ply", what="mesh")
            # server still alive and serving after the failed request
            assert client.metrics()["metrics"]["frames_fused"] == 2


class _GatedDriver:
    """Driver stub whose feed calls block on an event — lets the test back
    the ingest queue up deterministically."""

    def __init__(self):
        self.gate = threading.Event()
        self.calls = []

    def _feed(self, kind, stamp):
        self.gate.wait(30.0)
        self.calls.append((kind, float(stamp)))

    def feed_image(self, stamp, image):
        self._feed("image", stamp)

    def feed_depth(self, stamp, depth):
        self._feed("depth", stamp)

    def feed_pose(self, stamp, pose, **kw):
        self._feed("pose", stamp)

    def metrics(self):
        return {"frames_fused": 0.0}

    def save_mesh(self, path):
        return 0


def test_queue_overflow_drops_frames_not_poses():
    cfg = tiny_config()
    stub = _GatedDriver()
    server = bridge.MappingServer(stub, ("127.0.0.1", 0), queue_depth=4)
    try:
        with bridge.MappingClient(tuple(server.address)) as client:
            _serve_in_thread(server)
            pose = np.eye(4)
            img, dep = render_plane(cfg, pose)
            for i in range(8):
                client.publish_pose(float(i), pose, is_keyframe=(i == 0))
                client.publish_image(float(i), img)
                client.publish_depth(float(i), dep)
            # wait for the reader thread to take all 24 messages off the
            # socket; with the fuse thread gated and depth 4, frames must
            # have been dropped in favor of poses
            deadline = time.monotonic() + 20
            while (server.stats["received"] < 24
                   and time.monotonic() < deadline):
                time.sleep(0.01)
            assert server.stats["received"] == 24
            assert server.stats["dropped_frames"] > 0
            queued = [t for t, _ in list(server._queue.queue)]
            # frames are dropped preferentially: the backed-up queue holds
            # only pose messages (loop corrections are never sacrificed
            # while any frame remains)
            assert queued and all(t == bridge.T_POSE for t in queued)
        stub.gate.set()
    finally:
        stub.gate.set()
        server.shutdown()
    # every pose that survived the queue was fed, in order
    fed_poses = [s for k, s in stub.calls if k == "pose"]
    assert fed_poses == sorted(fed_poses)


class _WindowServer(bridge.MappingServer):
    """Holds the fuse thread BETWEEN queue.get and the driver feed — the
    exact window where the queue is empty but the message is not yet fused
    (a queue-empty-based drain would wrongly return here)."""

    window = None  # set after construction

    def _dispatch(self, mtype, payload):
        self.window.wait(30.0)
        super()._dispatch(mtype, payload)


def test_drain_covers_inflight_message():
    cfg = tiny_config()
    stub = _GatedDriver()
    stub.gate.set()  # feeds themselves are instant; the hold is pre-feed
    server = _WindowServer(stub, ("127.0.0.1", 0))
    server.window = threading.Event()
    try:
        with bridge.MappingClient(tuple(server.address)) as client:
            _serve_in_thread(server)
            img, _ = render_plane(cfg, np.eye(4))
            client.publish_image(0.0, img)
            # wait until the message is in flight: popped (queue empty) but
            # parked in the pre-feed window
            deadline = time.monotonic() + 20
            while ((server.stats["received"] < 1 or not server._queue.empty()
                    or server._pending == 0) and time.monotonic() < deadline):
                time.sleep(0.005)
            assert server._queue.empty() and server._pending == 1
            got = {}
            t = threading.Thread(
                target=lambda: got.update(client.metrics(drain=True)))
            t.start()
            time.sleep(0.3)
            # drain must NOT have completed while the message is in flight
            assert not got and not stub.calls
            server.window.set()
            t.join(30.0)
            assert got["metrics"]["bridge_frames"] == 1
            assert stub.calls == [("image", 0.0)]
    finally:
        server.window.set()
        server.shutdown()


def test_reconnect_resumes_live_map():
    cfg = tiny_config()
    served = SurfelMapping(cfg)
    with bridge.MappingServer(served, ("127.0.0.1", 0)) as server:
        _serve_in_thread(server)
        with bridge.MappingClient(tuple(server.address)) as client:
            _stream(client, cfg, 3)
            client.metrics()  # drain
        # second client continues into the same map
        with bridge.MappingClient(tuple(server.address)) as client:
            for i in range(3, 6):
                pose = np.eye(4)
                pose[0, 3] = 0.05 * i
                img, dep = render_plane(cfg, pose)
                client.publish_pose(float(i), pose, is_keyframe=(i % 2 == 0))
                client.publish_image(float(i), img)
                client.publish_depth(float(i), dep)
            m = client.metrics()["metrics"]
    assert m["frames_fused"] == 6
    assert m["bridge_reconnects"] == 2


def test_unix_socket_transport(tmp_path):
    cfg = tiny_config()
    path = str(tmp_path / "dsm.sock")
    with bridge.MappingServer(SurfelMapping(cfg), path) as server:
        _serve_in_thread(server)
        with bridge.MappingClient(path) as client:
            _stream(client, cfg, 2)
            assert client.metrics()["metrics"]["frames_fused"] == 2
