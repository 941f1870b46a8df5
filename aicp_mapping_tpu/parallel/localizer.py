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
    """Frame-to-sharded-map localization.

    Holds the map as (D, N/D) device-sharded blocks with per-block normals
    (computed once at load, sharded), the accumulated total correction, and
    the reference's gravity re-pinning of corrected poses
    (aligned_cloud.cpp:28-54)."""

    def __init__(self, mesh: Mesh, map_points: np.ndarray,
                 config: Optional[ICPConfig] = None, axis: str = "points",
                 normal_radius: float = 0.4,
                 trim_ratio: float = 0.7,
                 max_correction_magnitude: float = 0.0,
                 block_cell: float = 1.0):
        self.mesh = mesh
        self.axis = axis
        self.cfg = config or ICPConfig()
        self.trim_ratio = float(trim_ratio)
        self.max_correction = float(max_correction_magnitude)
        self.total_correction = np.eye(4, dtype=np.float32)
        self._first = True

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

    # ------------------------------------------------------------------
    def set_initial_guess(self, pose_in_map: np.ndarray,
                          world_to_body: np.ndarray) -> None:
        """Seed the correction chain (interactive-marker analog,
        app_ros.cpp:86-91)."""
        self.total_correction = (
            np.asarray(pose_in_map, np.float32)
            @ np.linalg.inv(np.asarray(world_to_body, np.float32))
        ).astype(np.float32)
        self._first = True

    def localize(self, points: np.ndarray, odom_pose: np.ndarray,
                 capacity: Optional[int] = None) -> np.ndarray:
        """Register one sensor-frame cloud against the sharded map; returns
        the corrected world pose. The first registration is exempt from the
        correction-magnitude gate (app.cpp:369 semantics)."""
        odom = np.asarray(odom_pose, np.float32)
        pose_est = self.total_correction @ odom
        cap = capacity or -(-len(points) // 512) * 512
        cloud = Cloud.from_numpy(points, capacity=cap)
        world = cloud.transform(jnp.asarray(pose_est))

        res = map_sharded_point_to_plane_icp(
            self.mesh, world.points, world.mask,
            self.map_points, self.map_normals, self.map_mask,
            se3.identity(), self.trim_ratio, self.cfg, axis=self.axis)
        corr = np.asarray(res.T)

        accepted = (self._first or self.max_correction <= 0.0
                    or np.all(np.abs(corr[:3, 3]) <= self.max_correction))
        if accepted:
            self.total_correction = (
                corr @ self.total_correction).astype(np.float32)
        self._first = False
        corrected = self.total_correction @ odom
        # gravity re-pin: roll/pitch from odometry (aligned_cloud.cpp:28-54)
        corrected = repin_roll_pitch_np(corrected, odom)
        # keep the chain consistent with the re-pinned output
        self.total_correction = (
            corrected @ np.linalg.inv(odom)).astype(np.float32)
        return corrected


def partial_shard_map(mesh: Mesh, axis: str):
    """Decorator: shard_map with (P(axis), P(axis)) -> P(axis) specs."""
    from functools import partial

    return partial(jax.shard_map, mesh=mesh,
                   in_specs=(P(axis), P(axis)), out_specs=P(axis),
                   check_vma=False)
