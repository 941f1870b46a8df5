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


def test_pcd_roundtrip_compressed(tmp_path):
    """binary_compressed (LZF, SoA layout) — PCL's default in many
    pipelines (cloudIO.cpp read paths); the round trip must be exact."""
    pts = np.random.default_rng(2).normal(0, 5, (4000, 3)).astype(np.float32)
    path = str(tmp_path / "c.pcd")
    write_pcd(path, pts, viewpoint=(4, 5, 6, 1, 0, 0, 0), binary="compressed")
    got, vp = read_pcd(path)
    np.testing.assert_array_equal(got, pts)
    np.testing.assert_allclose(vp[:3], [4, 5, 6])
    # structured data must actually compress
    import os

    grid = np.stack(np.meshgrid(np.arange(30.0), np.arange(30.0),
                                np.arange(3.0)), -1).reshape(-1, 3)
    gpath = str(tmp_path / "grid.pcd")
    write_pcd(gpath, grid.astype(np.float32), binary="compressed")
    bpath = str(tmp_path / "grid_b.pcd")
    write_pcd(bpath, grid.astype(np.float32), binary=True)
    assert os.path.getsize(gpath) < 0.8 * os.path.getsize(bpath)


def test_lzf_codec_roundtrip_and_backrefs():
    from aicp_mapping_tpu.io.pcd import lzf_compress, lzf_decompress

    rng = np.random.default_rng(3)
    for data in (b"", b"a", b"abcabcabcabcabc" * 100,
                 rng.bytes(5000),
                 bytes(np.zeros(10000, np.uint8)),
                 b"0123456789" * 3 + rng.bytes(64) + b"0123456789" * 3):
        comp = lzf_compress(data)
        assert lzf_decompress(comp, len(data)) == data
    # repetitive input must produce back-references (real compression)
    rep = b"xyzw" * 1000
    assert len(lzf_compress(rep)) < len(rep) // 4


def test_native_python_lzf_cross_compat(tmp_path):
    """Files written by the native writer must load via the Python reader
    and vice versa (same liblzf stream format)."""
    from aicp_mapping_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    pts = np.random.default_rng(4).normal(0, 3, (500, 3)).astype(np.float32)
    # native write -> python read
    npath = str(tmp_path / "n.pcd")
    native.write_pcd(npath, pts, binary="compressed")
    got, _ = read_pcd(npath)
    np.testing.assert_array_equal(got, pts)
    # python write -> native read
    ppath = str(tmp_path / "p.pcd")
    write_pcd(ppath, pts, binary="compressed")
    got2, _ = native.read_cloud(ppath)
    np.testing.assert_array_equal(got2, pts)


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
