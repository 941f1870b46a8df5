"""Offline sequence runner + recorder — the deterministic record/replay
harness (SURVEY.md §3.3).

Runner = `App::processFromFile` analog (app.cpp:250-279): reads
`aicp_input_poses.csv` + `cloud_<i>_<sec>_<nsec>.pcd` from a directory and
feeds each cloud through the pipeline. Recorder = `AppROS::writeCloudToFile`
analog (app_ros.cpp:152-175). Also includes a synthetic-sequence generator
(a simulated trajectory through a room world with odometry drift) used by
tests and benchmarks.
"""
from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np

from ..cloud import AlignedCloud, Cloud
from ..geometry import se3
from ..io.pcd import read_pcd, write_pcd
from ..io.poses import PoseWithTime, read_pose_csv, write_pose_csv
from .app import App, FrameResult
from .config import PipelineConfig


def wire_cloud(cfg: PipelineConfig, pts: np.ndarray,
               capacity: Optional[int] = None) -> Cloud:
    """Prepare one accumulated cloud for upload per the config's wire
    format (PipelineConfig.quantized_upload / wire_voxel): optional host
    native voxel pre-downsample, optional int16 fixed-point transfer. On a
    tunneled chip wire bytes serialize with device compute, so this is the
    throughput lever for the streaming drivers."""
    import dataclasses as _dc

    if cfg.wire_voxel > 0.0:
        from .. import native

        if cfg.quantized_upload:
            # fused native pass: voxel + int16 quantize in ~1 ms for a 60k
            # cloud (the split voxel-then-Cloud.from_numpy path costs ~8 ms
            # and was the App's host-side bottleneck)
            q, scale, center, n = native.voxel_downsample_q16(
                np.asarray(pts, np.float32), cfg.wire_voxel,
                cfg.downsample_capacity)
            return _dc.replace(Cloud.from_wire_q16(q, scale, center, n),
                               pre_voxelized=True)
        pts = native.voxel_downsample(np.asarray(pts, np.float32),
                                      cfg.wire_voxel,
                                      capacity=cfg.downsample_capacity)
        return _dc.replace(
            Cloud.from_numpy(pts, capacity=cfg.downsample_capacity,
                             quantize=cfg.quantized_upload),
            pre_voxelized=True)
    cap = capacity if capacity is not None else cfg.raw_capacity
    return Cloud.from_numpy(pts, capacity=cap,
                            quantize=cfg.quantized_upload)


def wire_batch(cfg: PipelineConfig, pts_list: list) -> list[Cloud]:
    """Batched wire prep: per-frame host native voxel + int16 quantize,
    then ONE stacked H2D transfer for the whole window. On the tunneled
    chip every transfer serializes with device compute AND pays a
    per-transfer setup cost, so shipping a finalize window's frames as a
    single (B, cap, 3) int16 buffer (16 x ~96 KB -> one ~1.5 MB transfer)
    amortizes that overhead to ~nothing per frame (r4 verdict weak #5).
    Per-frame Clouds are device-side slices of the batch — no extra wire
    bytes. Requires the quantized wire format (wire_voxel > 0 AND
    quantized_upload)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from .. import native
    from ..cloud import _dequantize_cloud

    assert cfg.wire_voxel > 0.0 and cfg.quantized_upload, \
        "wire_batch needs the quantized wire format"
    B = len(pts_list)
    cap = cfg.downsample_capacity
    qs = np.zeros((B, cap, 3), np.int16)
    scales = np.empty((B, 3), np.float32)
    centers = np.empty((B, 3), np.float32)
    counts = np.empty((B,), np.int32)
    for i, pts in enumerate(pts_list):
        q, scale, center, n = native.voxel_downsample_q16(
            np.asarray(pts, np.float32), cfg.wire_voxel, cap)
        qs[i] = q
        scales[i] = scale
        centers[i] = center
        counts[i] = n
    qb = jnp.asarray(qs)          # ONE stacked transfer
    sb = jnp.asarray(scales)
    cb = jnp.asarray(centers)
    return [
        _dc.replace(_dequantize_cloud(qb[i], sb[i], cb[i],
                                      np.int32(counts[i])),
                    pre_voxelized=True)
        for i in range(B)
    ]


class SequenceRunner:
    """`pipelined=True` drives App.submit_cloud instead of process_cloud:
    each frame's host sync overlaps the next frame's device compute
    (depth-1 pipeline, the reference's async-worker semantics). Results come
    out in order either way."""

    def __init__(self, app: App, raw_capacity: Optional[int] = None,
                 pipelined: bool = False):
        self.app = app
        self.raw_capacity = raw_capacity or app.cfg.raw_capacity
        self.pipelined = pipelined

    def _drive(self, ac: AlignedCloud) -> list[FrameResult]:
        if not self.pipelined:
            return [self.app.process_cloud(ac)]
        return self.app.submit_cloud(ac)

    def run_directory(self, directory: str,
                      prefetch_threads: int = 4) -> list[FrameResult]:
        """Replay a recorded sequence. Cloud files are loaded by the native
        ordered prefetcher (aicp_mapping_tpu.native.SequencePrefetcher) so
        disk IO and parsing overlap with device compute — replacing the
        synchronous per-frame read of App::processFromFile
        (app.cpp:261-278)."""
        from ..native import SequencePrefetcher

        poses = read_pose_csv(os.path.join(directory, "aicp_input_poses.csv"))
        paths = [os.path.join(
            directory, f"cloud_{p.counter}_{p.sec}_{p.nsec}.pcd")
            for p in poses]
        results = []
        pf = SequencePrefetcher(paths, capacity=self.raw_capacity,
                                n_threads=prefetch_threads)
        cfg = self.app.cfg
        wire = cfg.quantized_upload or cfg.wire_voxel > 0.0
        try:
            for idx, padded, count, _vp in pf:
                p = poses[idx]
                if wire:
                    cloud = wire_cloud(cfg, padded[:count],
                                       capacity=self.raw_capacity)
                else:
                    mask = np.zeros((self.raw_capacity,), bool)
                    mask[:count] = True
                    cloud = Cloud.from_numpy_padded(padded, mask)
                ac = AlignedCloud.create(p.utime, cloud, p.pose)
                results.extend(self._drive(ac))
        finally:
            pf.close()
        results.extend(self.app.flush())
        return results

    def run_clouds(self, items: Iterable[tuple[int, np.ndarray, np.ndarray]],
                   prep_workers: int = 1, prep_window: int = 2,
                   batch_h2d: int = 0, flush: bool = True
                   ) -> list[FrameResult]:
        """items: (utime, points (N,3), prior_pose (4,4)).

        Host wire prep (native voxel + quantize + H2D enqueue) runs up to
        `prep_window` frames ahead on `prep_workers` threads, delivered in
        order: the native pass and the transfer RPC release the GIL, so
        prep overlaps device compute. Default 1 worker / lookahead 2: this
        box has 2 CPU cores, and extra prep workers CONTEND with the
        dispatch + finalize threads instead of helping (measured: 2 workers
        dropped the App 100 -> 66 scans/s).

        `batch_h2d` > 1 (quantized wire format only) preps that many
        frames per worker task and ships them as ONE stacked transfer
        (`wire_batch`): per-transfer overhead on a tunneled chip amortizes
        across the window.

        `flush=False` leaves the submission pipeline FULL on return (up to
        pipeline_depth frames in flight; their results arrive on the next
        call or App.flush): back-to-back calls then stream continuously
        with no fill/drain bubble between them — how a deployment runs,
        and how steady-state throughput must be measured."""
        from concurrent.futures import ThreadPoolExecutor

        items = list(items)
        results = []
        cfg = self.app.cfg
        if (batch_h2d > 1 and cfg.wire_voxel > 0.0
                and cfg.quantized_upload):
            batches = [items[i:i + batch_h2d]
                       for i in range(0, len(items), batch_h2d)]
            with ThreadPoolExecutor(max_workers=1) as ex:
                fut = ex.submit(wire_batch, cfg,
                                [it[1] for it in batches[0]])
                for bi, bitems in enumerate(batches):
                    clouds = fut.result()
                    if bi + 1 < len(batches):
                        fut = ex.submit(wire_batch, cfg,
                                        [it[1] for it in batches[bi + 1]])
                    for (utime, _pts, pose), cloud in zip(bitems, clouds):
                        ac = AlignedCloud.create(
                            utime, cloud, np.asarray(pose, np.float32))
                        results.extend(self._drive(ac))
            if flush:
                results.extend(self.app.flush())
            return results
        with ThreadPoolExecutor(max_workers=prep_workers) as ex:
            futs = {
                i: ex.submit(wire_cloud, cfg, items[i][1], self.raw_capacity)
                for i in range(min(prep_window, len(items)))
            }
            for i, (utime, pts, pose) in enumerate(items):
                cloud = futs.pop(i).result()
                nxt = i + len(futs) + 1
                if nxt < len(items):
                    futs[nxt] = ex.submit(wire_cloud, cfg, items[nxt][1],
                                          self.raw_capacity)
                ac = AlignedCloud.create(utime, cloud,
                                         np.asarray(pose, np.float32))
                results.extend(self._drive(ac))
        if flush:
            results.extend(self.app.flush())
        return results


class SequenceRecorder:
    """Writes clouds + the pose CSV in the replayable layout."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._poses: list[PoseWithTime] = []
        self._counter = 0

    def record(self, utime: int, points: np.ndarray, pose: np.ndarray) -> None:
        sec = utime // 1_000_000
        nsec = utime - sec * 1_000_000
        p = PoseWithTime(self._counter, int(sec), int(nsec),
                         np.asarray(pose, np.float32))
        self._poses.append(p)
        write_pcd(os.path.join(
            self.directory, f"cloud_{p.counter}_{p.sec}_{p.nsec}.pcd"),
            points)
        self._counter += 1
        write_pose_csv(os.path.join(self.directory, "aicp_input_poses.csv"),
                       self._poses)


def synthetic_sequence(
    n_frames: int = 10,
    n_points: int = 8000,
    step: float = 0.8,
    yaw_rate_deg: float = 4.0,
    drift_per_frame: float = 0.03,
    drift_yaw_deg: float = 0.4,
    noise: float = 0.01,
    seed: int = 0,
    world_size: float = 18.0,
    sensor_range: float = 14.0,
):
    """Simulated lidar walk through a room world with odometry drift.

    Returns (items, gt_poses): items = (utime, points_in_odom_frame, odom_pose)
    ready for SequenceRunner.run_clouds; gt_poses are the true world poses.
    The odometry drifts so the pipeline has something to correct — mirroring
    the AICP operating regime (corrections bounded by
    max_correction_magnitude per frame).
    """
    import jax.numpy as jnp
    from ..tools.synthetic import room_cloud

    rng = np.random.default_rng(seed)
    world = room_cloud(n=60000, size=world_size, seed=seed, noise=noise)

    items = []
    gt_poses = []
    T_true = np.eye(4, dtype=np.float32)
    T_odom = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        # true motion: forward + yaw
        dyaw = np.deg2rad(yaw_rate_deg)
        delta = np.asarray(se3.make_transform(
            se3.so3_exp(jnp.asarray([0.0, 0.0, dyaw], dtype=np.float32)),
            jnp.asarray([step, 0.0, 0.0], dtype=np.float32)))
        T_true = T_true @ delta
        # odometry: same motion plus drift
        drift_t = rng.normal(0, drift_per_frame, 3).astype(np.float32)
        drift_t[2] *= 0.1
        dw = np.deg2rad(rng.normal(0, drift_yaw_deg))
        drift = np.asarray(se3.make_transform(
            se3.so3_exp(jnp.asarray([0.0, 0.0, dw], dtype=np.float32)),
            jnp.asarray(drift_t)))
        T_odom = T_odom @ delta @ drift

        # scan: world points within sensor range of the true pose,
        # expressed in the odom frame (what the accumulator would output:
        # velodyne_accumulator.cpp:62-67 transforms scans into odom).
        d = np.linalg.norm(world - T_true[:3, 3], axis=1)
        visible = world[d < sensor_range]
        if len(visible) > n_points:
            visible = visible[rng.choice(len(visible), n_points, replace=False)]
        local = (visible - T_true[:3, 3]) @ T_true[:3, :3]
        in_odom = local @ T_odom[:3, :3].T + T_odom[:3, 3]
        items.append((i * 1_000_000, in_odom.astype(np.float32), T_odom.copy()))
        gt_poses.append(T_true.copy())
    return items, np.stack(gt_poses)
