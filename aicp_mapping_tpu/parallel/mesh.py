"""Device-mesh helpers for single-host and multi-host runs.

The comm backend of the new framework (SURVEY.md §5.8): `jax.distributed` +
`jax.sharding.Mesh`, with collectives over ICI inserted by XLA / shard_map —
replacing the reference's ROS pub-sub / LCM multicast process boundary.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, (len(devs), n_devices)
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(shape: tuple[int, int], axes=("graph", "points")) -> Mesh:
    devs = jax.devices()
    n = shape[0] * shape[1]
    assert len(devs) >= n
    return Mesh(np.asarray(devs[:n]).reshape(shape), axes)


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op on a single process."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
