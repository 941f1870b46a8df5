"""End-to-end KITTI odometry runner.

The reference's KITTI flow is manual: kitti2pcd + ground removal scripts
(bash/kitti2pcd_no_ground.sh, tools/pcl_ground_removal.cpp), LCM replay of
raw GPS (tools/kitti_trajectory_from_raw_gps.cpp), then the devkit evaluator.
Here the whole flow is one call: velodyne `.bin` scans stream through the
native prefetcher, a constant-velocity motion model provides the odometry
prior (KITTI has no onboard state estimator in the odometry benchmark), and
the AICP pipeline produces the trajectory for `eval.kitti` metrics.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..cloud import AlignedCloud, Cloud
from ..native import SequencePrefetcher
from ..pipeline.app import App, FrameResult
from ..pipeline.config import PipelineConfig


def list_velodyne_scans(directory: str) -> list[str]:
    names = sorted(f for f in os.listdir(directory) if f.endswith(".bin"))
    return [os.path.join(directory, f) for f in names]


def run_kitti_sequence(
    scan_dir: str,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
    remove_ground: bool = False,
    prefetch_threads: int = 4,
    frame_stride: int = 1,
    priors: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, list[FrameResult], App]:
    """Returns (trajectory (F, 4, 4) KITTI-convention poses, frame results,
    the App).

    priors: optional (F, 4, 4) prior trajectory (GPS / wheel odometry) —
    the reference's KITTI flow consumed raw-GPS priors this way
    (kitti_trajectory_from_raw_gps.cpp); each frame's prior pose is the
    corrected chain composed with the prior trajectory's RELATIVE motion.
    Without priors a constant-velocity model is used — adequate on
    feature-rich scenes, but note frame-to-reference ICP cannot bootstrap
    forward motion in corridor-degenerate street scenes from a standstill
    prior (the same reason the reference requires a state estimator)."""
    cfg = config or PipelineConfig(
        raw_capacity=131072, downsample_capacity=32768,
        filtered_capacity=16384, sensor_range=80.0,
        max_correction_magnitude=2.0,
        # no odometry in the KITTI benchmark: a constant-velocity prior can
        # be badly off, so keep enough correspondences to recover from it
        trim_ratio_floor=0.50)
    if config is None:
        import dataclasses

        # normal-space trimming by default: without ground removal, a
        # horizontal prior error leaves ground matches at ~zero distance
        # and a global trim quantile discards exactly the facade
        # correspondences that constrain it (see ICPConfig.trim_normal_space)
        cfg.icp = dataclasses.replace(cfg.icp, trim_normal_space=True)
    app = App(cfg)

    paths = list_velodyne_scans(scan_dir)[::frame_stride]
    if max_frames is not None:
        paths = paths[:max_frames]

    gcfg = None
    if remove_ground:
        from ..ops.ground import GroundFilterConfig
        gcfg = GroundFilterConfig(cell_size=0.5, grid_dim=256)

    trajectory: list[np.ndarray] = []
    results: list[FrameResult] = []
    prior = np.eye(4, dtype=np.float32)
    velocity = np.eye(4, dtype=np.float32)   # constant-velocity motion model

    pf = SequencePrefetcher(paths, capacity=cfg.raw_capacity,
                            n_threads=prefetch_threads)
    try:
        for idx, padded, count, _vp in pf:
            if cfg.quantized_upload or cfg.wire_voxel > 0.0:
                from ..pipeline.sequence import wire_cloud

                cloud = wire_cloud(cfg, padded[:count])
            else:
                mask = np.zeros((cfg.raw_capacity,), bool)
                mask[:count] = True
                cloud = Cloud.from_numpy_padded(padded, mask)
            if gcfg is not None:
                from ..ops.ground import remove_ground as rg
                import jax.numpy as jnp
                non_ground, _ = rg(cloud.points, cloud.mask, gcfg)
                cloud = Cloud(cloud.points, non_ground)
            # scans are in the sensor frame; express in the world prior
            cloud = cloud.transform(_j(prior))
            ac = AlignedCloud.create(idx, cloud, _j(prior))
            res = app.process_cloud(ac)
            results.append(res)
            pose = np.asarray(res.corrected_pose) if res is not None else prior
            if priors is not None and idx + 1 < len(priors):
                rel = (np.linalg.inv(np.asarray(priors[idx]))
                       @ np.asarray(priors[idx + 1]))
                velocity = rel.astype(np.float32)
            elif trajectory:
                velocity = np.linalg.inv(trajectory[-1]) @ pose
            trajectory.append(pose)
            prior = (pose @ velocity).astype(np.float32)
    finally:
        pf.close()
    return np.stack(trajectory), results, app


def _j(a: np.ndarray):
    import jax.numpy as jnp

    return jnp.asarray(a, jnp.float32)
