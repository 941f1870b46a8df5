import numpy as np
import pytest

from aicp_mapping_tpu.io import (
    PoseWithTime,
    read_kitti_poses,
    read_pcd,
    read_pose_csv,
    viewpoint_to_pose,
    write_kitti_poses,
    write_pcd,
    write_pose_csv,
)


def test_pcd_roundtrip_binary(tmp_path):
    pts = np.random.default_rng(0).normal(0, 2, (100, 3)).astype(np.float32)
    path = str(tmp_path / "a.pcd")
    write_pcd(path, pts, viewpoint=(1, 2, 3, 1, 0, 0, 0), binary=True)
    got, vp = read_pcd(path)
    np.testing.assert_allclose(got, pts, rtol=1e-6)
    np.testing.assert_allclose(vp[:3], [1, 2, 3])


def test_pcd_roundtrip_ascii(tmp_path):
    pts = np.random.default_rng(1).normal(0, 2, (50, 3)).astype(np.float32)
    path = str(tmp_path / "b.pcd")
    write_pcd(path, pts, binary=False)
    got, _ = read_pcd(path)
    np.testing.assert_allclose(got, pts, atol=1e-5)


def test_pcd_drops_nan(tmp_path):
    pts = np.array([[0, 0, 0], [np.nan, 1, 1], [2, 2, 2]], dtype=np.float32)
    path = str(tmp_path / "c.pcd")
    write_pcd(path, pts)
    got, _ = read_pcd(path)
    assert got.shape[0] == 2


def test_viewpoint_to_pose():
    T = viewpoint_to_pose(np.array([1.0, 2.0, 3.0, 1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_pose_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    poses = []
    for i in range(5):
        T = np.eye(4, dtype=np.float32)
        # random small rotation + translation
        angle = rng.normal(0, 0.3)
        c, s = np.cos(angle), np.sin(angle)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = rng.normal(0, 5, 3)
        poses.append(PoseWithTime(i, 100 + i, 500, T))
    path = str(tmp_path / "aicp_input_poses.csv")
    write_pose_csv(path, poses)
    got = read_pose_csv(path)
    assert len(got) == 5
    for a, b in zip(poses, got):
        assert (a.counter, a.sec, a.nsec) == (b.counter, b.sec, b.nsec)
        np.testing.assert_allclose(b.pose, a.pose, atol=1e-5)


def test_kitti_poses_roundtrip(tmp_path):
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, 0, 3] = np.arange(4)
    path = str(tmp_path / "00.txt")
    write_kitti_poses(path, poses)
    got = read_kitti_poses(path)
    np.testing.assert_allclose(got, poses, atol=1e-6)


def test_vtk_roundtrip(tmp_path):
    from aicp_mapping_tpu.io.vtk import read_vtk, write_vtk

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    for binary in (False, True):
        p = str(tmp_path / f"c_{binary}.vtk")
        write_vtk(p, pts, binary=binary)
        got = read_vtk(p)
        np.testing.assert_allclose(got, pts, atol=1e-5)


def test_occupied_cells():
    from aicp_mapping_tpu.utils.visualizer import occupied_cells

    pts = np.array([[0.1, 0.1, 0.1], [0.15, 0.12, 0.13], [1.3, 0.1, 0.1]],
                   np.float32)
    cells = occupied_cells(pts, 0.5)
    assert cells.shape == (2, 3)
    np.testing.assert_allclose(cells[0], [0.25, 0.25, 0.25], atol=1e-6)


def test_debug_dir_dumps(tmp_path):
    import os
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.config import PipelineConfig
    from aicp_mapping_tpu.pipeline.sequence import (SequenceRunner,
                                                    synthetic_sequence)

    cfg = PipelineConfig(raw_capacity=8192, downsample_capacity=4096,
                         filtered_capacity=2048, min_cluster_size=20,
                         debug_dir=str(tmp_path / "aicp_data"))
    items, _ = synthetic_sequence(n_frames=3, n_points=3000, seed=8)
    SequenceRunner(App(cfg)).run_clouds(items)
    files = os.listdir(cfg.debug_dir)
    assert any("prefiltered" in f for f in files)
    assert any("aligned" in f for f in files)
