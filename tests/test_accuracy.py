"""Trajectory-accuracy regression on the outdoor urban drive (SURVEY §4.6,
VERDICT r1 missing #1): the pipeline must remove most of the injected
odometry drift on a realistically hard scene — 64-beam raycast scans,
road speed, 90-degree turns, ground-dominated clouds.

The full-scale artifact (ACCURACY_r2.json, 200 frames on TPU) is produced by
`python -m aicp_mapping_tpu.eval.accuracy`; this test runs a reduced version
in CI (CPU, fewer frames/beams) with the same thresholds structure.
"""
import numpy as np
import pytest

from aicp_mapping_tpu.eval.accuracy import run_accuracy
from aicp_mapping_tpu.pipeline.config import PipelineConfig


@pytest.fixture(scope="module")
def result():
    # NOTE: outdoor scenes need downsample_capacity >= 8192 and
    # filtered_capacity >= 4096 — smaller budgets thin the walls away and
    # the pipeline degrades below odometry (measured r2: ATE 0.26 m at
    # 4096/2048 vs 0.03 m at 8192/4096 on this sequence).
    cfg = PipelineConfig(
        working_mode="debug",
        segmentation_method="region_growing",
        raw_capacity=16384,
        downsample_capacity=8192,
        filtered_capacity=4096,
    )
    return run_accuracy(
        n_frames=20, seed=0, cfg=cfg,
        seq_kwargs=dict(n_azimuth=512, n_points_cap=16000,
                        drift_per_m=0.025, drift_yaw_deg_per_m=0.2))


@pytest.mark.slow
def test_pipeline_beats_odometry(result):
    pipe = result["pipeline"]
    odo = result["odometry_only"]
    assert pipe["ate_rmse_noalign_m"] < 0.75 * odo["ate_rmse_noalign_m"], result
    # rotation improves less at 20 CI frames (few delta-10 RPE pairs);
    # the 200-frame TPU artifact (ACCURACY_r2.json) shows the full margin
    assert pipe["rpe_rot_rmse_deg"] < 0.75 * odo["rpe_rot_rmse_deg"], result


@pytest.mark.slow
def test_absolute_accuracy_threshold(result):
    # sub-0.5% of the ~19 m track (the reference's KITTI-class regime is
    # sub-percent translation error)
    assert result["pipeline"]["ate_rmse_m"] < 0.08, result
    assert result["dropped_frames"] == 0, result


def test_urban_scan_has_structure():
    """The synthetic scanner must produce ground + wall returns with
    occlusion (ranges spread) — guards the generator itself."""
    from aicp_mapping_tpu.tools.urban import (drive_trajectory,
                                              make_urban_world, velodyne_scan)

    w = make_urban_world(seed=0)
    tr = drive_trajectory(10, w)
    scan = velodyne_scan(w, tr[0], n_azimuth=512)
    assert len(scan) > 10000
    wall_frac = float(np.mean(scan[:, 2] > 0.5))
    assert 0.02 < wall_frac < 0.5, wall_frac
    r = np.linalg.norm(scan[:, :2], axis=1)
    assert np.percentile(r, 95) > 25.0  # long-range returns exist
    # no vehicle pose may sit inside a building
    for T in tr:
        p = T[:2, 3]
        inside = ((p[0] > w.boxes[:, 0]) & (p[0] < w.boxes[:, 3])
                  & (p[1] > w.boxes[:, 1]) & (p[1] < w.boxes[:, 4]))
        assert not inside.any()
