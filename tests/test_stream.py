"""Streaming driver: accumulation, motion gate, bounded queue, worker thread,
corrected-pose output at pose frequency (AppROS semantics)."""
import numpy as np
import pytest

from aicp_mapping_tpu.geometry import se3
from aicp_mapping_tpu.pipeline.app import App
from aicp_mapping_tpu.pipeline.config import PipelineConfig
from aicp_mapping_tpu.pipeline.sequence import synthetic_sequence
from aicp_mapping_tpu.pipeline.stream import StreamingDriver, _rpy


def _small_app():
    cfg = PipelineConfig(raw_capacity=8192, downsample_capacity=4096,
                         filtered_capacity=2048, min_cluster_size=20)
    return App(cfg)


def test_rpy_matches_se3():
    import jax.numpy as jnp
    T = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.1, -0.2, 0.3])), jnp.zeros(3)))
    r, p, y = _rpy(T[:3, :3])
    q = se3.matrix_to_quat(jnp.asarray(T[:3, :3]))
    rr, pp, yy = se3.quat_to_euler(q)
    np.testing.assert_allclose([r, p, y], [float(rr), float(pp), float(yy)],
                               atol=1e-5)


def test_scan_before_pose_is_ignored():
    drv = StreamingDriver(_small_app(), batch_size=1)
    drv.on_scan(0, np.random.rand(100, 3).astype(np.float32))
    assert drv.accu.count == 0 and not drv._queue


def test_motion_gate_blocks_stationary_clouds():
    drv = StreamingDriver(_small_app(), batch_size=1, max_range=100.0)
    drv.on_pose(0, np.eye(4))
    scan = np.random.uniform(1, 5, (200, 3)).astype(np.float32)
    drv.on_scan(1, scan)          # batch complete but robot hasn't moved
    assert len(drv._queue) == 0
    assert drv.accu.count == 0    # cleared, not queued

    # move 2 m -> gate opens
    T = np.eye(4); T[0, 3] = 2.0
    drv.on_pose(2, T)
    drv.on_scan(3, scan)
    assert len(drv._queue) == 1


def test_rotation_gate():
    drv = StreamingDriver(_small_app(), batch_size=1, max_range=100.0)
    drv.on_pose(0, np.eye(4))
    scan = np.random.uniform(1, 5, (100, 3)).astype(np.float32)
    import jax.numpy as jnp
    T = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, np.deg2rad(15.0)])),
        jnp.zeros(3)))
    drv.on_pose(1, T)
    drv.on_scan(2, scan)
    assert len(drv._queue) == 1


def test_bounded_queue_drops_oldest():
    drv = StreamingDriver(_small_app(), batch_size=1, max_queue_size=2,
                          max_range=100.0)
    drv.on_pose(0, np.eye(4))
    scan = np.random.uniform(1, 5, (100, 3)).astype(np.float32)
    for i in range(4):
        T = np.eye(4); T[0, 3] = 2.0 * (i + 1)
        drv.on_pose(i, T)
        drv.on_scan(i, scan)
    assert len(drv._queue) == 2
    assert drv.n_dropped == 2


def test_end_to_end_stream(tmp_path):
    """Full driver loop over a synthetic drive: scans arrive in the sensor
    frame, poses at higher frequency; the worker registers clouds and the
    corrected-pose output tracks ground truth."""
    items, gt = synthetic_sequence(n_frames=5, n_points=4000, step=1.5, seed=2)
    app = _small_app()
    poses_out = []
    results = []
    drv = StreamingDriver(
        app, batch_size=1, max_range=100.0,
        motion_gate_translation=0.5,
        pose_callback=lambda t, T: poses_out.append((t, T)),
        result_callback=results.append)
    drv.run()
    try:
        for utime, pts_odom, odom_pose in items:
            drv.on_pose(utime, odom_pose)
            # driver expects sensor-frame scans; invert the odom pose
            local = (pts_odom - odom_pose[:3, 3]) @ odom_pose[:3, :3]
            drv.on_scan(utime, local.astype(np.float32))
            drv.flush()
    finally:
        drv.stop()

    # With batch_size=1 the clear_clouds_buffer handshake consumes the scan
    # immediately following every correction (app_ros.cpp:118-125, 185-199),
    # so alternate frames are intentionally dropped: 0 (bootstrap), 1
    # (registered -> correction), 2 (cleared), 3 (registered), 4 (cleared).
    assert len(results) == 3
    assert drv.n_processed == 3
    assert all(np.isfinite(r.corrected_pose).all() for r in results)
    assert len(poses_out) == len(items)
    # corrected-pose channel must reflect the accumulated correction
    final = app.correct_pose(items[-1][2])
    err = np.linalg.norm(final[:3, 3] - gt[-1][:3, 3])
    assert err < 0.5, err


def test_clear_buffer_handshake():
    """After a correction, the next scan clears the accumulation buffer
    instead of mixing scans across odom estimates."""
    drv = StreamingDriver(_small_app(), batch_size=3, max_range=100.0)
    drv.on_pose(0, np.eye(4))
    scan = np.random.uniform(1, 5, (100, 3)).astype(np.float32)
    drv.on_scan(1, scan)
    assert drv.accu.count > 0
    with drv._state_mutex:
        drv._updated_correction = True
    drv.on_pose(2, np.eye(4))     # latches clear_clouds_buffer
    drv.on_scan(3, scan)          # clears instead of accumulating
    assert drv.accu.count == 0


def test_concurrent_stress_pose_scan_threads():
    """Race/stress test (SURVEY.md 5.2 — the reference relies on manual
    mutex discipline with zero sanitizer coverage): a pose thread at
    estimator rate, a scan thread at lidar rate, and a control thread
    injecting corrections hammer the driver concurrently while the worker
    registers clouds. Asserts no exceptions escape any thread, the queue
    bound holds, accounting stays consistent, and the driver shuts down
    clean."""
    import threading

    items, _ = synthetic_sequence(n_frames=5, n_points=2500, step=1.5, seed=4)
    app = _small_app()
    errors: list[BaseException] = []
    results = []
    drv = StreamingDriver(app, batch_size=1, max_range=100.0,
                          motion_gate_translation=0.1, max_queue_size=2,
                          result_callback=results.append)
    drv.run()
    stop = threading.Event()

    def guard(fn):
        def wrapped():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — test must see it
                errors.append(e)
        return wrapped

    @guard
    def pose_thread():
        i = 0
        while not stop.is_set():
            utime, _, odom = items[i % len(items)]
            drv.on_pose(utime + i, odom)
            i += 1

    @guard
    def scan_thread():
        i = 0
        while not stop.is_set():
            utime, pts_odom, odom = items[i % len(items)]
            local = (pts_odom - odom[:3, 3]) @ odom[:3, :3]
            drv.on_scan(utime + i, local.astype(np.float32))
            i += 1

    @guard
    def control_thread():
        while not stop.is_set():
            app.inject_correction(np.eye(4, dtype=np.float32))
            with drv._data_mutex:
                assert len(drv._queue) <= drv.max_queue_size

    threads = [threading.Thread(target=t, daemon=True)
               for t in (pose_thread, scan_thread, control_thread)]
    for t in threads:
        t.start()
    import time
    time.sleep(4.0)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads)
    drv.stop()

    assert not errors, errors
    assert drv.n_processed == len(results) or drv.pipelined
    assert drv.n_processed + drv.n_dropped >= len(results)
    assert all(np.isfinite(r.corrected_pose).all() for r in results)
