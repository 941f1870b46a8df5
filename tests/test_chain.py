"""ICP chain variants: DataPointsFilter analogs, named chain configs,
and 2D planar-scan registration (reference: config/icp/*.yaml chains +
aicp_core/data/scan_*.csv assets)."""
import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from aicp_mapping_tpu.geometry import se3
from aicp_mapping_tpu.io.planar import (
    planar_to_cloud,
    read_planar_csv,
    synthetic_room_scan,
    write_planar_csv,
)
from aicp_mapping_tpu.pipeline.config import load_icp_chain_yaml
from aicp_mapping_tpu.registration import point_to_plane_icp
from aicp_mapping_tpu.registration.chain import (
    ChainFilterConfig,
    apply_chain_filters,
    max_density_filter,
    min_dist_filter,
    random_sampling_filter,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pad(pts, cap):
    out = np.zeros((cap, 3), np.float32)
    out[: len(pts)] = pts
    mask = np.zeros((cap,), bool)
    mask[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(mask)


def test_min_dist_filter():
    pts, mask = _pad(np.array([[0.1, 0, 0], [5, 0, 0], [0, 3, 0]]), 8)
    out = min_dist_filter(pts, mask, jnp.zeros(3), 1.0)
    np.testing.assert_array_equal(
        np.asarray(out)[:3], [False, True, True])
    assert not np.asarray(out)[3:].any()


def test_random_sampling_filter_rate():
    mask = jnp.ones((4096,), bool)
    out = random_sampling_filter(mask, 0.25, seed=3)
    frac = float(jnp.mean(out.astype(jnp.float32)))
    assert 0.2 < frac < 0.3
    # deterministic for replay
    out2 = random_sampling_filter(mask, 0.25, seed=3)
    assert bool(jnp.all(out == out2))


def test_max_density_filter_caps_cells():
    rng = np.random.default_rng(0)
    # 500 points crammed into one 0.2 m cell + 10 spread far apart
    dense = rng.uniform(0, 0.19, (500, 3)).astype(np.float32)
    sparse = (np.arange(10)[:, None] * np.array([5.0, 0, 0])).astype(
        np.float32) + 1.0
    pts, mask = _pad(np.concatenate([dense, sparse]), 1024)
    out = np.asarray(max_density_filter(pts, mask, 0.2))
    assert out[:500].sum() == 1      # one survivor per cell
    assert out[500:510].all()        # far-apart points untouched
    assert not out[510:].any()


def test_apply_chain_filters_composes():
    rng = np.random.default_rng(1)
    pts, mask = _pad(rng.uniform(-5, 5, (1000, 3)).astype(np.float32), 1024)
    cfg = ChainFilterConfig(min_dist=1.0, random_sampling_prob=0.5)
    out = apply_chain_filters(pts, mask, jnp.zeros(3), cfg)
    kept = np.asarray(out)
    assert 0 < kept.sum() < 600
    d = np.linalg.norm(np.asarray(pts)[kept], axis=1)
    assert (d >= 1.0 - 1e-5).all()


def test_all_chain_configs_load():
    paths = sorted(glob.glob(os.path.join(REPO, "configs/icp/*.yaml")))
    assert len(paths) >= 10
    for p in paths:
        cfg, rd, rf = load_icp_chain_yaml(p)
        assert cfg.error_metric in ("point_to_plane", "point_to_point"), p
        assert 0.0 <= cfg.trim_ratio <= 1.0, p
        assert cfg.max_iterations > 0, p


def test_planar_csv_roundtrip(tmp_path):
    scan = synthetic_room_scan((0.2, 0.1, 0.05), n_beams=180, seed=7)
    path = str(tmp_path / "scan.csv")
    write_planar_csv(path, scan)
    back = read_planar_csv(path)
    assert back.shape == scan.shape
    np.testing.assert_allclose(back, scan, atol=1e-4)


def test_shipped_planar_assets_load():
    for i in range(3):
        scan = read_planar_csv(os.path.join(REPO, f"data/scan_{i:02d}.csv"))
        assert len(scan) > 500
        assert np.isfinite(scan).all()


def test_2d_registration_recovers_pose():
    """Register two planar room scans with the 2D-testing chain
    (icp_2Dtesting_cfg.yaml analog) and recover the relative pose."""
    pose_a = (0.0, 0.0, 0.0)
    pose_b = (0.25, -0.15, 0.06)
    ref2d = synthetic_room_scan(pose_a, n_beams=720, seed=0)
    read2d = synthetic_room_scan(pose_b, n_beams=720, seed=1)

    cfg, rd_f, rf_f = load_icp_chain_yaml(
        os.path.join(REPO, "configs/icp/icp_2d_testing.yaml"))
    # ground truth: reading sensor frame -> reference sensor frame
    xb, yb, tb = pose_b
    ct, st = np.cos(tb), np.sin(tb)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:2, :2] = [[ct, -st], [st, ct]]
    T_gt[0, 3], T_gt[1, 3] = xb, yb

    ref_pts, ref_mask = _pad(planar_to_cloud(ref2d), 1024)
    read_pts, read_mask = _pad(planar_to_cloud(read2d), 1024)
    normals = jnp.zeros_like(ref_pts)  # unused by point_to_point
    res = point_to_plane_icp(read_pts, read_mask, ref_pts, normals,
                             ref_mask, se3.identity(),
                             jnp.float32(cfg.trim_ratio), cfg)
    T = np.asarray(res.T)
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.03
    # rotation error (radians)
    dR = T[:3, :3] @ T_gt[:3, :3].T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.01
