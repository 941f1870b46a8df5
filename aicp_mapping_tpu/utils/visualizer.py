"""Visualizer sink interface (abstract Visualizer analog,
include/aicp_utils/visualizer.hpp:11-63).

The reference publishes clouds/poses/maps to ROS or LCM; here the sinks are
pluggable: `NullVisualizer` (default), `RecordingVisualizer` (in-memory, for
tests/eval), and `FileVisualizer` (PCD/CSV dumps — the /tmp/aicp_data analog,
app.cpp:19-29).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def occupied_cells(points: "np.ndarray", resolution: float) -> "np.ndarray":
    """Centers of occupied voxel cells — the octree-drawing analog
    (drawingUtils.cpp publishOctreeToLCM: leaf centers at the query depth).
    Host-side numpy; for visualization sinks, not the hot path."""
    import numpy as np

    pts = np.asarray(points, np.float32).reshape(-1, 3)
    q = np.unique(np.floor(pts / resolution).astype(np.int64), axis=0)
    return ((q + 0.5) * resolution).astype(np.float32)


class Visualizer:
    """Abstract sink; all hooks are optional no-ops."""

    def publish_cloud(self, points: np.ndarray, channel: int, name: str,
                      utime: int) -> None: ...

    def publish_map(self, points: np.ndarray, utime: int, channel: int) -> None: ...

    def publish_pose(self, pose: np.ndarray, channel: int, name: str,
                     utime: int) -> None: ...

    def publish_prior_pose(self, pose: np.ndarray, channel: int, name: str,
                           utime: int) -> None: ...

    def publish_odom_pose(self, pose: np.ndarray, channel: int, name: str,
                          utime: int) -> None: ...

    def publish_odom_to_map(self, pose: np.ndarray, utime: int) -> None: ...

    def publish_metric(self, name: str, value: float, utime: int) -> None: ...

    def publish_lines(self, segments: np.ndarray, name: str,
                      utime: int) -> None:
        """Line-segment geometry (K, 2, 3) — octree wireframes / normal
        whiskers from utils.drawing (drawingUtils.cpp analog)."""
        ...

    def get_path(self) -> list[np.ndarray]:
        return [np.eye(4, dtype=np.float32)]


class NullVisualizer(Visualizer):
    pass


class RecordingVisualizer(Visualizer):
    """Keeps everything in memory — used by tests and the evaluators."""

    def __init__(self) -> None:
        self.clouds: list[tuple[int, np.ndarray]] = []
        self.maps: list[tuple[int, np.ndarray]] = []
        self.poses: list[tuple[int, np.ndarray]] = []
        self.prior_poses: list[tuple[int, np.ndarray]] = []
        self.odom_poses: list[tuple[int, np.ndarray]] = []
        self.odom_to_map: list[tuple[int, np.ndarray]] = []
        self.metrics: dict[str, list[tuple[int, float]]] = {}
        self.lines: list[tuple[int, str, np.ndarray]] = []

    def publish_cloud(self, points, channel, name, utime):
        self.clouds.append((utime, np.asarray(points)))

    def publish_map(self, points, utime, channel):
        self.maps.append((utime, np.asarray(points)))

    def publish_pose(self, pose, channel, name, utime):
        self.poses.append((utime, np.asarray(pose)))

    def publish_prior_pose(self, pose, channel, name, utime):
        self.prior_poses.append((utime, np.asarray(pose)))

    def publish_odom_pose(self, pose, channel, name, utime):
        self.odom_poses.append((utime, np.asarray(pose)))

    def publish_odom_to_map(self, pose, utime):
        self.odom_to_map.append((utime, np.asarray(pose)))

    def publish_metric(self, name, value, utime):
        self.metrics.setdefault(name, []).append((utime, float(value)))

    def publish_lines(self, segments, name, utime):
        self.lines.append((utime, name, np.asarray(segments)))

    def get_path(self) -> list[np.ndarray]:
        if not self.poses:
            return [np.eye(4, dtype=np.float32)]
        return [p for _, p in self.poses]


class FileVisualizer(RecordingVisualizer):
    """Additionally dumps clouds/maps as PCD under a data directory
    (the reference's /tmp/aicp_data debug artifacts, app.cpp:339-350)."""

    def __init__(self, directory: str) -> None:
        super().__init__()
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def publish_cloud(self, points, channel, name, utime):
        super().publish_cloud(points, channel, name, utime)
        from ..io.pcd import write_pcd
        write_pcd(os.path.join(self.directory,
                               f"cloud_{name or channel}_{utime}.pcd"),
                  np.asarray(points))

    def publish_map(self, points, utime, channel):
        super().publish_map(points, utime, channel)
        from ..io.pcd import write_pcd
        write_pcd(os.path.join(self.directory, "aligned_map.pcd"),
                  np.asarray(points))
