"""OXTS parsing, go-back talker, initial guess, timing utils."""
import numpy as np

from aicp_mapping_tpu.io.oxts import (
    lat_to_scale, latlon_to_mercator, oxts_records_to_poses)
from aicp_mapping_tpu.utils.talker import Talker, angle_between_2d, reverse_path


def test_oxts_poses_start_at_identity_and_move():
    # two records 0.001 deg apart in longitude at lat 49 (KITTI-ish)
    rec = np.array([
        [49.0, 8.43, 112.0, 0.01, -0.02, 0.3],
        [49.0, 8.431, 112.5, 0.01, -0.02, 0.31],
        [49.0005, 8.432, 113.0, 0.0, 0.0, 0.32],
    ])
    poses = oxts_records_to_poses(rec)
    assert poses.shape == (3, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-5)
    # 0.001 deg lon at lat 49 is ~73 m of mercator easting, scaled by cos(49)
    d = np.linalg.norm(poses[1][:3, 3])
    assert 40 < d < 90, d
    # rotations stay orthonormal
    for p in poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                   atol=1e-6)


def test_mercator_scale():
    assert abs(lat_to_scale(0.0) - 1.0) < 1e-12
    mx, my = latlon_to_mercator(0.0, 1.0, 1.0)
    assert abs(mx - 111319.49) < 1.0  # one degree of longitude at equator
    assert abs(my) < 1e-6


def test_reverse_path_orients_along_trajectory():
    # straight line along +x, poses facing +x
    path = []
    for i in range(4):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = float(i)
        path.append(T)
    rev = reverse_path(path)
    # reversed: positions 3,2,1,0; headings along -x (180 deg)
    assert [p[0, 3] for p in rev] == [3.0, 2.0, 1.0, 0.0]
    for p in rev[:-1]:
        np.testing.assert_allclose(p[:3, 0], [-1, 0, 0], atol=1e-6)
    # publisher callback receives the plan
    got = {}
    t = Talker(publish=lambda plan, utime: got.update(n=len(plan), t=utime))
    t.publish_footstep_plan(path, 123, reverse=True)
    assert got == {"n": 4, "t": 123}


def test_angle_between_2d_signs():
    assert abs(angle_between_2d(np.array([1, 0]), np.array([0, 1])) - 90) < 1e-9
    assert abs(angle_between_2d(np.array([1, 0]), np.array([0, -1])) + 90) < 1e-9


def test_app_initial_guess():
    from aicp_mapping_tpu.pipeline.app import App
    from aicp_mapping_tpu.pipeline.config import PipelineConfig

    app = App(PipelineConfig(raw_capacity=1024, downsample_capacity=512,
                             filtered_capacity=256))
    marker = np.eye(4, dtype=np.float32)
    marker[:3, 3] = [5.0, 2.0, 0.0]
    odom = np.eye(4, dtype=np.float32)
    odom[:3, 3] = [1.0, 0.0, 0.0]
    app.set_initial_guess(marker, odom)
    corrected = app.correct_pose(odom)
    np.testing.assert_allclose(corrected, marker, atol=1e-6)


def test_octree_wireframe_edges():
    from aicp_mapping_tpu.utils.drawing import octree_wireframe
    from aicp_mapping_tpu.utils.visualizer import occupied_cells

    pts = np.array([[0.05, 0.05, 0.05], [0.06, 0.04, 0.05],  # same cell
                    [1.05, 0.05, 0.05]], np.float32)
    segs = octree_wireframe(pts, 0.2)
    cells = occupied_cells(pts, 0.2)
    assert segs.shape == (len(cells) * 12, 2, 3)
    # every segment is a cube edge: axis-aligned, length == resolution
    d = segs[:, 1] - segs[:, 0]
    lengths = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(lengths, 0.2, atol=1e-6)
    assert np.all((np.abs(d) > 1e-7).sum(axis=1) == 1)  # axis-aligned
    # all corners lie on the cell boundaries
    assert np.all(np.abs(segs.reshape(-1, 3) / 0.2
                         - np.round(segs.reshape(-1, 3) / 0.2)) < 1e-5)


def test_normals_segments_and_pose_axes():
    from aicp_mapping_tpu.geometry import se3
    from aicp_mapping_tpu.utils.drawing import (normals_segments,
                                                pose_axes_segments)

    pts = np.random.default_rng(0).uniform(-1, 1, (10, 3)).astype(np.float32)
    nrm = np.tile([0.0, 0.0, 1.0], (10, 1)).astype(np.float32)
    segs = normals_segments(pts, nrm, scale=0.5, stride=2)
    assert segs.shape == (5, 2, 3)
    np.testing.assert_allclose(segs[:, 1] - segs[:, 0],
                               np.tile([0, 0, 0.5], (5, 1)), atol=1e-6)

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 2, 3]
    segs = pose_axes_segments(T, scale=0.7)
    assert segs.shape == (3, 2, 3)
    np.testing.assert_allclose(segs[0, 1] - segs[0, 0], [0.7, 0, 0],
                               atol=1e-6)
    np.testing.assert_allclose(segs[:, 0], np.tile([1, 2, 3], (3, 1)),
                               atol=1e-6)


def test_write_vtk_lines(tmp_path):
    from aicp_mapping_tpu.io.vtk import write_vtk_lines

    segs = np.arange(24, dtype=np.float32).reshape(4, 2, 3)
    p = str(tmp_path / "lines.vtk")
    write_vtk_lines(p, segs)
    text = open(p, "rb").read().decode()
    assert "POINTS 8 float" in text
    assert "LINES 4 12" in text
    assert "2 0 1" in text and "2 6 7" in text
