"""Live-ingestion bridge throughput (window-independent, CPU backend).

The serving pitch needs a transport number: how fast can frames reach
the map through the socket protocol (io/bridge.py — the rebuild of the
reference's ROS topic transport, `ros_node.cpp:24-32`)?  This measures,
on the CPU backend with a tiny camera so the relay/fuse cost is out of
the picture:

  * raw protocol rate — length-prefixed npz messages over a unix-domain
    socket (and TCP loopback), MB/s and msgs/s, payload = one KITTI-size
    image+depth pair per message;
  * end-to-end serve rate — MappingClient streaming synchronized
    (image, depth, pose) triples into a live MappingServer (bounded
    decoupling queue + fuse thread), frames fused/s.

Usage: python experiments/bridge_profile.py [n_frames]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import tempfile
import time

import numpy as np


def raw_protocol_rate(n_msgs: int, address) -> None:
    """Socket + npz framing cost alone: a sink server that decodes and
    discards every message (no mapping), KITTI-size payloads."""
    import socket as socketlib
    import threading
    from densesurfelmapping_tpu.io import bridge

    h, w = 376, 1241
    img = np.random.randint(0, 255, (h, w)).astype(np.uint8)
    dep = np.random.uniform(1, 30, (h, w)).astype(np.float32)
    payload = bridge._pack_arrays(stamp=np.float64(0.0), image=img,
                                  depth=dep)
    srv = bridge._listen(address)
    got = [0]

    def sink():
        conn, _ = srv.accept()
        while True:
            m = bridge._recv_msg(conn)
            if m is None:
                return
            bridge._unpack_arrays(m[1])
            got[0] += 1

    t = threading.Thread(target=sink, daemon=True)
    t.start()
    cli = bridge._connect(srv.getsockname()
                          if isinstance(address, tuple) else address, 10.0)
    t0 = time.perf_counter()
    for _ in range(n_msgs):
        bridge._send_msg(cli, bridge.T_IMAGE, payload)
    cli.close()
    t.join(timeout=30)
    dt = time.perf_counter() - t0
    kind = "tcp" if isinstance(address, tuple) else "unix"
    mb = len(payload) * got[0] / 1e6
    print(f"raw {kind:4s}: {got[0] / dt:7.1f} msgs/s  {mb / dt:7.1f} MB/s "
          f"({len(payload) / 1e6:.2f} MB/msg, decoded+discarded)",
          flush=True)


def serve_rate(n_frames: int) -> None:
    """Full client->server->driver path, tiny camera on the CPU backend
    (protocol + queue + sync + fuse cost without relay noise)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.io import bridge
    from densesurfelmapping_tpu.pipeline.device_driver import (
        DeviceResidentMapping)

    cam = CameraIntrinsics(width=64, height=48, fx=60.0, fy=60.0,
                           cx=31.5, cy=23.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=16384, lane_align=8)
    h, w = cfg.height, cfg.width
    imgs = [np.random.randint(0, 255, (h, w)).astype(np.float32)
            for _ in range(8)]
    deps = [np.random.uniform(1, 8, (h, w)).astype(np.float32)
            for _ in range(8)]

    import threading
    path = os.path.join(tempfile.mkdtemp(), "dsm.sock")
    for pipelined in (False, True):
        drv = DeviceResidentMapping(cfg, pipelined=pipelined)
        with bridge.MappingServer(drv, address=path + str(pipelined)) as srv:
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            with bridge.MappingClient(srv.address) as cli:
                pose = np.eye(4)
                cli.publish_image(0.0, imgs[0])
                cli.publish_depth(0.0, deps[0])
                cli.publish_pose(0.0, pose, is_keyframe=True)
                cli.metrics(drain=True)          # warmup + compile barrier
                t0 = time.perf_counter()
                for i in range(1, n_frames):
                    pose = np.eye(4)
                    pose[0, 3] = 0.05 * i
                    cli.publish_image(float(i), imgs[i % 8])
                    cli.publish_depth(float(i), deps[i % 8])
                    cli.publish_pose(float(i), pose,
                                     is_keyframe=(i % 2 == 0))
                m = cli.metrics(drain=True)      # drains the queue
                dt = time.perf_counter() - t0
                fused = m.get("metrics", {}).get("frames_fused", 0)
        tag = "piped" if pipelined else "eager"
        print(f"serve ({tag}, tiny cam, cpu backend): streamed "
              f"{(n_frames - 1) / dt:7.1f} triples/s, fused "
              f"{fused / dt:7.1f} frames/s "
              f"({n_frames - 1 - fused:.0f} dropped under overload — "
              f"bounded-queue ROS semantics)", flush=True)


def main(n_frames: int = 300):
    with tempfile.TemporaryDirectory() as d:
        raw_protocol_rate(n_frames, os.path.join(d, "raw.sock"))
    raw_protocol_rate(n_frames, ("127.0.0.1", 0))
    serve_rate(n_frames)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
