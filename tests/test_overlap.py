import jax.numpy as jnp
import numpy as np
import pytest

from aicp_mapping_tpu.cloud import Cloud
from aicp_mapping_tpu.geometry import se3
from aicp_mapping_tpu.overlap import alignability_filter, compute_overlap, fov_overlap
from aicp_mapping_tpu.tools.synthetic import corridor_cloud, room_cloud


def test_voxel_overlap_identical_clouds():
    pts = room_cloud(n=3000, seed=0)
    c = Cloud.from_numpy(pts, capacity=3072)
    stats = compute_overlap(c.points, c.mask, c.points, c.mask, 0.2)
    assert float(stats.overlap_percent) == pytest.approx(100.0)


def test_voxel_overlap_disjoint_clouds():
    a = Cloud.from_numpy(room_cloud(n=2000, seed=0), capacity=2048)
    shifted = room_cloud(n=2000, seed=0) + np.array([100.0, 0, 0], np.float32)
    b = Cloud.from_numpy(shifted, capacity=2048)
    stats = compute_overlap(a.points, a.mask, b.points, b.mask, 0.2)
    assert float(stats.overlap_percent) == pytest.approx(0.0)


def test_voxel_overlap_partial():
    pts = room_cloud(n=4000, seed=1)
    a = Cloud.from_numpy(pts, capacity=4096)
    # half-shifted copy: overlap strictly between 0 and 100
    b = Cloud.from_numpy(pts + np.array([5.0, 0, 0], np.float32), capacity=4096)
    stats = compute_overlap(a.points, a.mask, b.points, b.mask, 0.2)
    assert 0.0 < float(stats.overlap_percent) < 60.0


def test_fov_overlap_full_360():
    # 360-degree sensors co-located: everything in range -> 100%
    pts = room_cloud(n=2000, seed=2)
    c = Cloud.from_numpy(pts, capacity=2048)
    ov, ma, mb = fov_overlap(c.points, c.mask, se3.identity(),
                             c.points, c.mask, se3.identity(),
                             sensor_range=100.0, angular_view_deg=360.0)
    assert float(ov) == pytest.approx(100.0, abs=0.1)
    assert bool(jnp.all(ma == c.mask))


def test_fov_overlap_range_limit():
    pts = np.array([[1.0, 0, 0], [50.0, 0, 0]], dtype=np.float32)
    c = Cloud.from_numpy(pts, capacity=4)
    ov, ma, _ = fov_overlap(c.points, c.mask, se3.identity(),
                            c.points, c.mask, se3.identity(),
                            sensor_range=10.0, angular_view_deg=360.0)
    # only 1 of 2 points within range in each direction -> 0.5*0.5*100 = 25
    assert float(ov) == pytest.approx(25.0)
    assert list(np.asarray(ma)) == [True, False, False, False]


def test_alignability_room_vs_corridor():
    """Room (planes in many directions) must be far more alignable than a
    corridor (all normals in the y/z plane) — ICRA'18 premise; semantics of
    filteringUtils.cpp:365-400."""
    room = Cloud.from_numpy(room_cloud(n=6000, seed=3, noise=0.005), 6144)
    corr = Cloud.from_numpy(corridor_cloud(n=6000, seed=3, noise=0.005), 6144)

    a_room, diag_room = alignability_filter(
        room.points, room.mask, se3.identity(),
        room.points, room.mask, se3.identity(),
        ds_capacity=2048, max_clusters=16)
    a_corr, diag_corr = alignability_filter(
        corr.points, corr.mask, se3.identity(),
        corr.points, corr.mask, se3.identity(),
        ds_capacity=2048, max_clusters=16)

    assert float(diag_room["n_matched_points"]) > 0
    assert float(diag_corr["n_matched_points"]) > 0
    assert float(a_room) > 3.0 * max(float(a_corr), 1e-3), (
        float(a_room), float(a_corr))


def test_alignability_empty_overlap_returns_zero():
    pts = room_cloud(n=1000, seed=4)
    c = Cloud.from_numpy(pts, capacity=1024)
    empty = jnp.zeros_like(c.mask)
    a, diag = alignability_filter(
        c.points, empty, se3.identity(), c.points, empty, se3.identity(),
        ds_capacity=512, max_clusters=8)
    assert float(a) == 0.0
