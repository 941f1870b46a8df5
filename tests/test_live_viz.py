"""Live streaming visualizer (VERDICT r1 missing #4): the continuous
cloud/pose/metric transport analog of visualizer_ros.cpp:215-279."""
import socket
import threading
import time

import numpy as np

from aicp_mapping_tpu.utils.live_viz import LiveVisualizer, read_frames


def _connect(vis: LiveVisualizer) -> socket.socket:
    s = socket.create_connection(vis.address, timeout=5)
    # give the acceptor thread a beat to register the client
    deadline = time.time() + 5
    while time.time() < deadline:
        with vis._lock:
            if vis._clients:
                return s
        time.sleep(0.01)
    raise TimeoutError("client never registered")


def test_cloud_pose_metric_roundtrip():
    vis = LiveVisualizer()
    try:
        s = _connect(vis)
        cloud = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [1, 2, 3]
        vis.publish_cloud(cloud, 0, "reading", 42)
        vis.publish_pose(pose, 0, "", 43)
        vis.publish_metric("octree_overlap", 87.5, 44)

        frames = []
        it = read_frames(s)
        for _ in range(3):
            frames.append(next(it))
        (h1, a1), (h2, a2), (h3, _) = frames
        assert h1["type"] == "cloud" and h1["utime"] == 42
        np.testing.assert_array_equal(a1, cloud)
        assert h2["type"] == "pose"
        np.testing.assert_array_equal(a2, pose)
        assert h3["type"] == "metric" and h3["value"] == 87.5
        s.close()
    finally:
        vis.close()


def test_slow_viewer_never_blocks_publisher():
    vis = LiveVisualizer(max_queue=4)
    try:
        s = _connect(vis)
        # do NOT read from s; hammer the publisher — it must stay fast
        cloud = np.zeros((5000, 3), np.float32)
        t0 = time.perf_counter()
        for i in range(200):
            vis.publish_cloud(cloud, 0, "x", i)
        dt = time.perf_counter() - t0
        assert dt < 2.0, dt              # no backpressure stall
        assert vis.n_dropped > 0         # oldest frames were dropped
        s.close()
    finally:
        vis.close()


def test_app_streams_through_live_visualizer():
    """Drive the real pipeline with the live sink attached and assert a
    viewer receives the reference cloud + map + pose stream."""
    from aicp_mapping_tpu.pipeline import App, PipelineConfig, SequenceRunner
    from aicp_mapping_tpu.pipeline.sequence import synthetic_sequence

    vis = LiveVisualizer()
    try:
        s = _connect(vis)
        got: list[str] = []

        def reader():
            for h, _ in read_frames(s):
                got.append(h["type"])

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        cfg = PipelineConfig(raw_capacity=8192, downsample_capacity=4096,
                             filtered_capacity=2048, min_cluster_size=30)
        items, _ = synthetic_sequence(n_frames=6, n_points=5000, seed=0)
        SequenceRunner(App(cfg, visualizer=vis)).run_clouds(items)
        deadline = time.time() + 10
        while time.time() < deadline and "map" not in got:
            time.sleep(0.05)
        s.close()
        th.join(timeout=5)
        assert "cloud" in got and "map" in got and "metric" in got, got
    finally:
        vis.close()


def test_lines_frame_roundtrip():
    from aicp_mapping_tpu.utils.drawing import octree_wireframe

    viz = LiveVisualizer()
    try:
        sock = socket.create_connection(viz.address, timeout=5)
        time.sleep(0.2)  # let the writer thread attach
        pts = np.random.default_rng(1).uniform(-2, 2, (50, 3)).astype(
            np.float32)
        segs = octree_wireframe(pts, 0.5)
        viz.publish_lines(segs, "octree", 123)
        viz.publish_metric("done", 1.0, 124)
        header, arr = next(read_frames(sock))
        assert header["type"] == "lines"
        assert header["name"] == "octree"
        np.testing.assert_allclose(arr, segs, atol=1e-6)
        sock.close()
    finally:
        viz.close()
