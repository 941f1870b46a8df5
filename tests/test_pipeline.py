import numpy as np
import pytest

from aicp_mapping_tpu.cloud import Cloud
from aicp_mapping_tpu.pipeline import (
    App,
    PipelineConfig,
    SequenceRecorder,
    SequenceRunner,
    load_yaml_config,
    synthetic_sequence,
)
from aicp_mapping_tpu.utils.visualizer import RecordingVisualizer


def small_config(**kw) -> PipelineConfig:
    cfg = PipelineConfig(
        working_mode="debug",
        raw_capacity=8192,
        downsample_capacity=4096,
        filtered_capacity=2048,
        map_capacity=16384,
        align_ds_capacity=1024,
        align_max_clusters=8,
        min_cluster_size=30,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.fixture(scope="module")
def seq():
    return synthetic_sequence(n_frames=8, n_points=6000, seed=0)


def _pose_errors(frames, gt_poses):
    errs = []
    for fr, gt in zip(frames, gt_poses):
        errs.append(np.linalg.norm(fr.corrected_pose[:3, 3] - gt[:3, 3]))
    return np.array(errs)


def test_mapping_corrects_drift(seq):
    """Frame-to-reference mapping on a drifting-odometry sequence must track
    the true trajectory much better than raw odometry does."""
    items, gt = seq
    app = App(small_config())
    runner = SequenceRunner(app)
    frames = runner.run_clouds(items)

    assert all(f is not None for f in frames)
    assert all(f.accepted for f in frames)

    corrected_err = _pose_errors(frames, gt)
    odom_err = np.array([
        np.linalg.norm(item[2][:3, 3] - g[:3, 3]) for item, g in zip(items, gt)
    ])
    # odometry drifts; corrected poses stay close
    assert odom_err[-1] > 0.02
    assert corrected_err[-1] < 0.6 * odom_err[-1] + 0.01, (
        corrected_err, odom_err)
    assert corrected_err[-1] < 0.08


def test_windowed_reference_update(seq):
    items, _ = seq
    cfg = small_config(reference_update_frequency=3)
    app = App(cfg)
    SequenceRunner(app).run_clouds(items)
    # 8 frames: frame 0 = ref 0; updates at clouds 3, 6 (every 3 readings)
    ref_flags = [c.is_reference for c in app.graph.clouds]
    assert ref_flags[0] is True
    assert sum(ref_flags) >= 3
    assert app.updates_counter >= 2


def test_correction_gate_drops_bad_frames(seq):
    items, _ = seq
    cfg = small_config(max_correction_magnitude=1e-6)
    app = App(cfg)
    frames = SequenceRunner(app).run_clouds(items)
    # With an impossible gate every non-first frame is dropped
    assert frames[0].accepted
    assert not any(f.accepted for f in frames[1:])
    assert app.graph.n_clouds == 1


def test_localization_against_prior_map(seq):
    items, gt = seq
    # Build a prior map from the whole world seen by the sequence
    world = np.concatenate([it[1] for it in items])
    cfg = small_config(localize_against_prior_map=True,
                       crop_map_around_base=20.0)
    app = App(cfg)
    app.set_prior_map(Cloud.from_numpy(world, capacity=32768))
    frames = SequenceRunner(app).run_clouds(items)
    assert all(f is not None for f in frames)
    assert all(f.octree_overlap == 50.0 for f in frames)  # fixed (app.cpp:123-127)
    # no reference updates in prior-map localization
    assert app.updates_counter == 0


def test_first_registration_exempt_from_accept_gate(seq):
    """Relocalizing in a prior map with an initial offset beyond
    max_correction_magnitude must succeed: the reference applies the accept
    gate only when the graph already has clouds (app.cpp:369), so the FIRST
    registration is exempt — and only the first (the exemption must not leak
    to later frames while the graph still looks empty under pipelining)."""
    items, gt = seq
    world = np.concatenate([it[1] for it in items])
    offset = np.eye(4, dtype=np.float32)
    offset[:3, 3] = [0.25, -0.2, 0.0]    # |t| well over the 0.1 gate below
    # the whole odometry frame (points AND poses) is offset from the map
    # frame — the relocalization scenario
    shifted = [(u, p + offset[:3, 3], offset @ np.asarray(pose, np.float32))
               for u, p, pose in items]

    cfg = small_config(localize_against_prior_map=True,
                       crop_map_around_base=20.0,
                       max_correction_magnitude=0.1)
    app = App(cfg)
    app.set_prior_map(Cloud.from_numpy(world, capacity=32768))
    frames = SequenceRunner(app).run_clouds(shifted)

    assert frames[0].accepted
    # the first correction really was beyond the gate (exemption exercised)
    assert np.abs(frames[0].correction[:3, 3]).max() > 0.1
    # the offset is absorbed immediately (without the exemption the zeroed
    # correction chains into new_total and every later frame rejects)
    assert all(f.accepted for f in frames)
    err0 = np.linalg.norm(frames[0].corrected_pose[:3, 3] - gt[0][:3, 3])
    assert err0 < 0.1, err0
    final_err = np.linalg.norm(frames[-1].corrected_pose[:3, 3] - gt[-1][:3, 3])
    assert final_err < np.linalg.norm(offset[:3, 3]), final_err


def test_record_replay_determinism(tmp_path, seq):
    """record/replay harness (SURVEY.md §3.3): replay produces identical
    corrected poses."""
    items, _ = seq
    rec = SequenceRecorder(str(tmp_path))
    for utime, pts, pose in items[:4]:
        rec.record(utime, pts, pose)

    app1 = App(small_config())
    frames1 = SequenceRunner(app1).run_directory(str(tmp_path))
    app2 = App(small_config())
    frames2 = SequenceRunner(app2).run_directory(str(tmp_path))
    for f1, f2 in zip(frames1, frames2):
        np.testing.assert_array_equal(f1.corrected_pose, f2.corrected_pose)


def test_visualizer_outputs(seq):
    items, _ = seq
    vis = RecordingVisualizer()
    app = App(small_config(), visualizer=vis)
    SequenceRunner(app).run_clouds(items)
    assert len(vis.maps) >= 2          # first cloud + reference updates
    assert len(vis.poses) >= 1
    assert "octree_overlap" in vis.metrics


def test_correct_pose_composition(seq):
    items, _ = seq
    app = App(small_config())
    SequenceRunner(app).run_clouds(items)
    # robotPoseCallBack analog: corrected = total_correction * world_to_body
    wb = np.eye(4, dtype=np.float32)
    wb[:3, 3] = [1, 2, 3]
    out = app.correct_pose(wb)
    np.testing.assert_allclose(out, app.total_correction @ wb, atol=1e-6)


def test_yaml_config_parsing(tmp_path):
    p = tmp_path / "aicp_config.yaml"
    p.write_text(
        """
AICP: {
  Registration: {
    type: "Pointmatcher",
    sensorRange: 15.0,
    sensorAngularView: 270.0,
    loadPosesFrom: "pcd",
    initialTransform: "",
  },
  Overlap: {
    type: "OctreeBased",
    OctreeBased: { octomapResolution: 0.25 },
  },
  Classifier: {
    type: "SVM",
    SVM: { threshold: 0.65 },
  }
}
"""
    )
    cfg = load_yaml_config(str(p))
    assert cfg.sensor_range == 15.0
    assert cfg.sensor_angular_view == 270.0
    assert cfg.load_poses_from == "pcd"
    assert cfg.octree_resolution == 0.25
    assert cfg.risk_threshold == 0.65


def test_pipelined_matches_synchronous(seq):
    """App.submit_cloud (depth-1 pipeline: dispatch frame i+1 before
    finalizing frame i) must produce the SAME results as process_cloud on a
    nominal sequence — the speculative reference/total chaining is exact
    when every frame is accepted."""
    items, _ = seq
    frames_sync = SequenceRunner(App(small_config())).run_clouds(items)
    frames_pipe = SequenceRunner(App(small_config()),
                                 pipelined=True).run_clouds(items)
    assert len(frames_sync) == len(frames_pipe)
    for a, b in zip(frames_sync, frames_pipe):
        assert a.utime == b.utime
        assert a.accepted == b.accepted
        assert a.registered == b.registered
        assert a.reference_id == b.reference_id
        np.testing.assert_allclose(a.correction, b.correction,
                                   atol=1e-6, rtol=0)
        np.testing.assert_allclose(a.corrected_pose, b.corrected_pose,
                                   atol=1e-6, rtol=0)
        assert abs(a.octree_overlap - b.octree_overlap) < 1e-4


def test_quantized_upload_roundtrip():
    """int16 wire format: dequantized points match the source within the
    quantization step (extent/65534 per axis)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-80, 80, (5000, 3)).astype(np.float32)
    c = Cloud.from_numpy(pts, capacity=8192, quantize=True)
    got = c.to_numpy()
    assert got.shape == (5000, 3)
    np.testing.assert_allclose(got, pts, atol=0.005)
    assert int(np.asarray(c.count())) == 5000


def test_wire_format_tracks_raw_path(seq):
    """quantized int16 + host-voxel wire format must produce the same
    accept decisions and corrected trajectory (within quantization + grid
    phase effects) as the exact raw-f32 path."""
    items, _ = seq
    frames_raw = SequenceRunner(App(small_config())).run_clouds(items)
    cfg_w = small_config(quantized_upload=True, wire_voxel=0.08)
    frames_wire = SequenceRunner(App(cfg_w)).run_clouds(items)
    assert len(frames_raw) == len(frames_wire)
    for a, b in zip(frames_raw, frames_wire):
        assert a.accepted == b.accepted
        np.testing.assert_allclose(a.corrected_pose[:3, 3],
                                   b.corrected_pose[:3, 3], atol=0.03)


def test_async_finalize_matches_synchronous(seq):
    """cfg.async_finalize moves the batched device_get to a dedicated
    thread; results must still match the synchronous path exactly on a
    nominal sequence (same guarantee as test_pipelined_matches_synchronous)."""
    items, _ = seq
    frames_sync = SequenceRunner(App(small_config())).run_clouds(items)
    app = App(small_config(pipeline_depth=4, async_finalize=True))
    frames_async = SequenceRunner(app, pipelined=True).run_clouds(items)
    app.close()
    assert len(frames_sync) == len(frames_async)
    for a, b in zip(frames_sync, frames_async):
        assert a.utime == b.utime
        assert a.accepted == b.accepted
        assert a.reference_id == b.reference_id
        np.testing.assert_allclose(a.corrected_pose, b.corrected_pose,
                                   atol=1e-6, rtol=0)


def test_wire_format_directory_replay(tmp_path, seq):
    """run_directory honors the wire format (prefetcher output is
    re-quantized + host-voxelized before upload) and still reproduces the
    raw-path trajectory within tolerance."""
    items, _ = seq
    rec = SequenceRecorder(str(tmp_path))
    for utime, pts, pose in items[:4]:
        rec.record(utime, pts, pose)

    frames_raw = SequenceRunner(App(small_config())).run_directory(
        str(tmp_path))
    cfg_w = small_config(quantized_upload=True, wire_voxel=0.08)
    frames_wire = SequenceRunner(App(cfg_w)).run_directory(str(tmp_path))
    assert len(frames_raw) == len(frames_wire) == 4
    for a, b in zip(frames_raw, frames_wire):
        assert a.accepted == b.accepted
        np.testing.assert_allclose(a.corrected_pose[:3, 3],
                                   b.corrected_pose[:3, 3], atol=0.03)


def test_device_voxel_skip_for_wire_clouds():
    """A host-voxelized wire cloud skips the device re-voxelization
    (fused._pre_voxelized): the fused frame step must produce the same
    registration as the path that re-voxelizes on device."""
    import jax.numpy as jnp

    from aicp_mapping_tpu import native
    from aicp_mapping_tpu.geometry import se3
    from aicp_mapping_tpu.ops.normals import estimate_normals
    from aicp_mapping_tpu.pipeline.fused import _pre_voxelized, make_frame_step
    from aicp_mapping_tpu.tools.synthetic import room_cloud

    cfg_skip = small_config(wire_voxel=0.08)
    cfg_full = small_config()
    assert _pre_voxelized(cfg_skip, cfg_skip.downsample_capacity)
    assert not _pre_voxelized(cfg_skip, cfg_skip.raw_capacity)
    assert not _pre_voxelized(cfg_full, cfg_full.downsample_capacity)

    world = room_cloud(n=6000, size=8.0, seed=5, noise=0.01)
    wire = native.voxel_downsample(world.astype(np.float32), 0.08,
                                   capacity=cfg_skip.downsample_capacity)
    reading = Cloud.from_numpy(wire, capacity=cfg_skip.downsample_capacity)
    ref = Cloud.from_numpy(world[::2], capacity=cfg_skip.filtered_capacity)
    normals, _, _ = estimate_normals(ref.points, ref.mask, k=12)
    vp = jnp.zeros((3,), jnp.float32)

    out_skip = make_frame_step(cfg_skip)(
        reading.points, reading.mask, vp,
        ref.points, normals, ref.mask, se3.identity())
    out_full = make_frame_step(cfg_full)(
        reading.points, reading.mask, vp,
        ref.points, normals, ref.mask, se3.identity())
    # identical input cloud, one device re-bucketing apart: registration
    # must agree to well under the voxel size
    np.testing.assert_allclose(np.asarray(out_skip.correction),
                               np.asarray(out_full.correction), atol=5e-3)
    assert abs(float(out_skip.overlap_percent)
               - float(out_full.overlap_percent)) < 5.0
