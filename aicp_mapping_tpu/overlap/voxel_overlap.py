"""Occupancy-grid overlap between two clouds ("octree overlap").

TPU-native replacement for the reference's octomap-based estimator
(aicp_core/src/overlap/octrees_overlap.cpp:29-72): both clouds are
voxelized at `resolution` (aicp_config.yaml:21, 0.2 m) on a shared grid and

    overlap = min(|A ∩ B| / |A|, |A ∩ B| / |B|) * 100

over occupied voxel keys — the co-occupied leaf-key counting of
octrees_overlap.cpp:44-53 without the per-ray free-space insertion (the
reference marks every leaf occupied after insertion, so occupied-cell
intersection carries the signal; ray-carving is unnecessary for the metric).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.voxel import voxel_set_overlap


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OverlapStats:
    overlap_percent: jax.Array   # min-ratio * 100 (octrees_overlap.cpp:51-53)
    n_common: jax.Array
    n_ref: jax.Array
    n_read: jax.Array

    def loop_closure_tuple(self):
        """min / |max-min| ratios, the debug stats of
        computeLoopClosureFromOverlap (octrees_overlap.cpp:75-111)."""
        ra = self.n_common / jnp.maximum(self.n_ref, 1)
        rb = self.n_common / jnp.maximum(self.n_read, 1)
        mn = jnp.minimum(ra, rb) * 100.0
        mx = jnp.maximum(ra, rb) * 100.0
        return mn, jnp.abs(mx - mn), ra * 100.0, rb * 100.0


@jax.jit
def compute_overlap(ref_points, ref_mask, read_points, read_mask,
                    resolution=0.2) -> OverlapStats:
    """Both clouds must be in the same (world) frame."""
    n_common, n_ref, n_read = voxel_set_overlap(
        ref_points, ref_mask, read_points, read_mask, resolution
    )
    ra = n_common / jnp.maximum(n_ref, 1)
    rb = n_common / jnp.maximum(n_read, 1)
    return OverlapStats(
        overlap_percent=jnp.minimum(ra, rb) * 100.0,
        n_common=n_common,
        n_ref=n_ref,
        n_read=n_read,
    )
