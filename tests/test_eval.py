import numpy as np
import pytest

from aicp_mapping_tpu.eval.kitti import (
    ate_rmse,
    average_errors,
    calc_sequence_errors,
    rpe,
    trajectory_distances,
)


def straight_trajectory(n=1200, step=1.0):
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    return poses


def test_trajectory_distances():
    poses = straight_trajectory(11)
    d = trajectory_distances(poses)
    np.testing.assert_allclose(d, np.arange(11.0))


def test_perfect_trajectory_zero_error():
    gt = straight_trajectory()
    errs = calc_sequence_errors(gt, gt)
    assert len(errs) > 0
    stats = average_errors(errs)
    assert stats["t_err_percent"] == pytest.approx(0.0, abs=1e-9)
    assert stats["r_err_deg_per_m"] == pytest.approx(0.0, abs=1e-9)


def test_scaled_trajectory_known_error():
    gt = straight_trajectory(1200, 1.0)
    res = straight_trajectory(1200, 0.98)  # 2% scale error
    stats = average_errors(calc_sequence_errors(gt, res))
    assert stats["t_err_percent"] == pytest.approx(2.0, rel=0.05)


def test_ate_alignment_removes_rigid_offset():
    gt = straight_trajectory(100)
    res = gt.copy()
    res[:, :3, 3] += np.array([5.0, -3.0, 1.0])  # rigid offset
    assert ate_rmse(gt, res, align=True) < 1e-6
    assert ate_rmse(gt, res, align=False) == pytest.approx(
        np.linalg.norm([5.0, -3.0, 1.0]), rel=1e-6)


def test_rpe_detects_jitter():
    rng = np.random.default_rng(0)
    gt = straight_trajectory(200)
    res = gt.copy()
    res[:, :3, 3] += rng.normal(0, 0.05, (200, 3))
    out = rpe(gt, res, delta=1)
    assert 0.02 < out["rpe_trans_rmse_m"] < 0.3
