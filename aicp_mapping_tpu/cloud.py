"""Padded, masked point-cloud containers.

TPU-native replacement for the reference's PCL containers and `AlignedCloud`
(aicp_core/include/aicp_registration/aligned_cloud.hpp:11-70,
 aicp_core/src/registration/aligned_cloud.cpp). Everything is fixed-capacity
and mask-validated so that all downstream kernels see static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import se3


@jax.jit
def _dequantize_jit(q: jax.Array, scale: jax.Array, center: jax.Array,
                    count: jax.Array):
    pts = q.astype(jnp.float32) * scale + center
    mask = jax.lax.iota(jnp.int32, q.shape[0]) < count
    return pts, mask


def _dequantize_cloud(q, scale, center, count) -> "Cloud":
    pts, mask = _dequantize_jit(q, scale, center, count)
    return Cloud(pts, mask)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Cloud:
    """A fixed-capacity point cloud.

    points: (N, 3) float32 — padded entries are arbitrary (usually 0)
    mask:   (N,)  bool     — True for valid points
    pre_voxelized: static metadata — True when the cloud already went
    through a host voxel grid at least as coarse as the pipeline's device
    voxel (wire_cloud sets it); the App's voxel-skip fast path REQUIRES it
    for small clouds rather than inferring from shape (a user-built small
    cloud would otherwise silently skip the voxel stage and hit the
    radius-normal prefilter with non-uniform density — r3 advisor finding).
    """

    points: jax.Array
    mask: jax.Array
    pre_voxelized: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def transform(self, T: jax.Array) -> "Cloud":
        return Cloud(se3.transform_points(T, self.points), self.mask,
                     self.pre_voxelized)

    @staticmethod
    def from_numpy(arr: np.ndarray, capacity: Optional[int] = None,
                   quantize: bool = False) -> "Cloud":
        """quantize=True sends the points over the wire as int16 fixed-point
        (6 bytes/point instead of 12 + no mask array — the validity mask is
        rebuilt on device from the count) and dequantizes on device. On a
        tunneled chip the per-frame H2D transfer SERIALIZES with compute
        (measured: 768 KB/frame costs ~6 ms of wire time the device spends
        idle), so halving the bytes directly raises pipeline throughput.
        Quantization step = extent/65534 per axis (2.5 mm at a 160 m span)
        — far below lidar noise."""
        arr = np.asarray(arr, dtype=np.float32).reshape(-1, 3)
        n = arr.shape[0]
        cap = capacity if capacity is not None else n
        if n > cap:
            # Deterministic uniform subsample to capacity.
            idx = np.linspace(0, n - 1, cap).astype(np.int64)
            arr = arr[idx]
            n = cap
        if quantize and n > 0:
            lo = arr.min(axis=0)
            hi = arr.max(axis=0)
            center = (hi + lo) * 0.5
            scale = np.maximum((hi - lo) / 65534.0, 1e-6).astype(np.float32)
            q = np.zeros((cap, 3), dtype=np.int16)
            q[:n] = np.round((arr - center) / scale)
            return _dequantize_cloud(q, jnp.asarray(scale),
                                     jnp.asarray(center.astype(np.float32)),
                                     np.int32(n))
        pts = np.zeros((cap, 3), dtype=np.float32)
        pts[:n] = arr
        mask = np.zeros((cap,), dtype=bool)
        mask[:n] = True
        return Cloud(jnp.asarray(pts), jnp.asarray(mask))

    @staticmethod
    def from_wire_q16(q: np.ndarray, scale: np.ndarray, center: np.ndarray,
                      count: int) -> "Cloud":
        """Wrap a pre-quantized int16 wire payload (see
        native.voxel_downsample_q16): ships `q` over the wire and
        dequantizes on device — the zero-copy fast path of
        from_numpy(quantize=True) for hosts that already hold the
        fixed-point buffer."""
        return _dequantize_cloud(
            jnp.asarray(q), jnp.asarray(np.asarray(scale, np.float32)),
            jnp.asarray(np.asarray(center, np.float32)), np.int32(count))

    @staticmethod
    def from_numpy_padded(points: np.ndarray, mask: np.ndarray) -> "Cloud":
        """Wrap an already-padded (capacity, 3) buffer + mask (zero-copy on
        the host side; used by the native prefetcher)."""
        return Cloud(jnp.asarray(points, dtype=jnp.float32),
                     jnp.asarray(mask, dtype=bool))

    def to_numpy(self) -> np.ndarray:
        pts = np.asarray(self.points)
        m = np.asarray(self.mask)
        return pts[m]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NormalCloud:
    """Cloud with per-point normals and curvature (PCL XYZRGBNormal analog)."""

    points: jax.Array   # (N, 3)
    normals: jax.Array  # (N, 3)
    curvature: jax.Array  # (N,)
    mask: jax.Array     # (N,)

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def as_cloud(self) -> Cloud:
        return Cloud(self.points, self.mask)

    def transform(self, T: jax.Array) -> "NormalCloud":
        return NormalCloud(
            se3.transform_points(T, self.points),
            se3.rotate_vectors(T, self.normals),
            self.curvature,
            self.mask,
        )


def repin_roll_pitch_np(corrected: np.ndarray, odom: np.ndarray) -> np.ndarray:
    """Replace roll/pitch of `corrected` with odometry's, keeping yaw and
    translation (removePitchRollCorrection, aligned_cloud.cpp:31-52).

    Host-side numpy twin of se3.repin_roll_pitch (ZYX euler convention,
    common.cpp:70-105): poses are tiny and touched every frame — keeping
    their math on the host avoids device dispatch + fetch round-trips, which
    dominate per-frame latency on a remote-tunneled chip (~25 ms each).
    """
    R_o = np.asarray(odom, np.float64)[:3, :3]
    R_c = np.asarray(corrected, np.float64)[:3, :3]
    # ZYX: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    roll = np.arctan2(R_o[2, 1], R_o[2, 2])
    pitch = -np.arcsin(np.clip(R_o[2, 0], -1.0, 1.0))
    yaw = np.arctan2(R_c[1, 0], R_c[0, 0])
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R = np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R.astype(np.float32)
    out[:3, 3] = np.asarray(corrected, np.float32)[:3, 3]
    return out


@dataclasses.dataclass
class AlignedCloud:
    """Host-side record of one accumulated cloud and its poses.

    Mirrors the reference's `AlignedCloud` semantics
    (aligned_cloud.cpp:6-74): odom pose is never updated; prior pose may be
    re-seeded; corrected = correction * prior with roll/pitch re-pinned to
    odometry. Poses are host numpy — only point data lives on device.
    """

    utime: int
    cloud: Cloud
    odom_pose: np.ndarray      # world_to_cloud_odom_ (4, 4)
    prior_pose: np.ndarray     # world_to_cloud_prior_
    correction: np.ndarray     # cloud_to_reference_
    corrected_pose: np.ndarray  # world_to_cloud_corrected_
    is_reference: bool = False
    its_reference_id: int = -1

    @staticmethod
    def create(utime: int, cloud: Cloud, prior_pose) -> "AlignedCloud":
        prior_pose = np.asarray(prior_pose, dtype=np.float32)
        return AlignedCloud(
            utime=utime,
            cloud=cloud,
            odom_pose=prior_pose,
            prior_pose=prior_pose,
            correction=np.eye(4, dtype=np.float32),
            corrected_pose=prior_pose,
            is_reference=False,
            its_reference_id=-1,
        )

    def update(
        self,
        cloud: Cloud,
        correction=None,
        is_reference: bool = False,
        its_reference_id: Optional[int] = None,
    ) -> None:
        """Apply a correction and re-pin roll/pitch (aligned_cloud.cpp:56-74)."""
        if correction is not None:
            self.correction = np.asarray(correction, dtype=np.float32)
        self.cloud = cloud
        corrected = np.asarray(self.correction) @ np.asarray(self.prior_pose)
        self.corrected_pose = repin_roll_pitch_np(corrected, self.odom_pose)
        self.is_reference = is_reference
        if its_reference_id is not None:
            self.its_reference_id = its_reference_id


class AlignedCloudsGraph:
    """Append-only list of aligned clouds + current-reference index.

    Reference: aligned_clouds_graph.cpp / aligned_clouds_graph.hpp:10-43
    ("graph" in name only there; loop-closure edges are added by the new
    pose-graph backend in aicp_mapping_tpu.parallel.posegraph).
    """

    def __init__(self) -> None:
        self.clouds: list[AlignedCloud] = []
        self.current_reference_id: int = -1

    def is_empty(self) -> bool:
        return len(self.clouds) == 0

    def initialize(self, reference: AlignedCloud) -> None:
        reference.is_reference = True
        reference.its_reference_id = 0
        self.clouds = [reference]
        self.current_reference_id = 0

    def add(self, cloud: AlignedCloud) -> None:
        self.clouds.append(cloud)

    def update_reference(self, idx: int) -> None:
        self.clouds[idx].is_reference = True
        self.current_reference_id = idx

    @property
    def n_clouds(self) -> int:
        return len(self.clouds)

    def current_reference(self) -> AlignedCloud:
        return self.clouds[self.current_reference_id]

    def last(self) -> AlignedCloud:
        return self.clouds[-1]
