"""ICP quality monitoring: Hausdorff distance, residual statistics.

TPU-native analog of aicp_core/src/utils/icpMonitor.cpp:
  - hausdorffDistance (+ robust quantile variant, icpMonitor.cpp:12-81)
  - per-point KNN distances (icpMonitor.cpp:89-138)
  - residual mean/median/quantile (icpMonitor.cpp:233-252)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import nn_argmin_xla
from ..ops.quantile import masked_mean, masked_median, masked_quantile

_BIG = np.float32(3.4e38)


@jax.jit
def hausdorff_distance(points_a, mask_a, points_b, mask_b, quantile=1.0):
    """Symmetric (quantile-robust) Hausdorff distance in meters.

    quantile=1.0 gives the classic max-of-min; the reference's robust variant
    uses a quantile of the directed NN distances (icpMonitor.cpp:44-76).
    """
    d_ab, _ = nn_argmin_xla(points_a, mask_a, points_b, mask_b)
    d_ba, _ = nn_argmin_xla(points_b, mask_b, points_a, mask_a)
    da = jnp.sqrt(jnp.maximum(masked_quantile(d_ab, mask_a, quantile), 0.0))
    db = jnp.sqrt(jnp.maximum(masked_quantile(d_ba, mask_b, quantile), 0.0))
    return jnp.maximum(da, db)


@jax.jit
def distances_knn(points_a, mask_a, points_b, mask_b):
    """Per-point nearest-neighbor distances of cloud A against cloud B
    (icpMonitor.cpp:89-138 `distancesKNN`): returns (dists (N,), idx (N,))
    with +inf for invalid entries."""
    d2, idx = nn_argmin_xla(points_a, mask_a, points_b, mask_b)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    return jnp.where(mask_a, d, _BIG), idx


@jax.jit
def paired_points_mean_distance(points_a, points_b, mask):
    """Mean distance between already-paired points (icpMonitor.cpp:146-231):
    both arrays index-aligned, e.g. inlier matches after registration."""
    d = jnp.linalg.norm(points_a - points_b, axis=-1)
    return masked_mean(d, mask)


@jax.jit
def residual_stats(dist2, mask, quantile=0.75):
    """Mean / median / quantile of NN residual distances (meters)."""
    d = jnp.sqrt(jnp.maximum(jnp.where(mask, dist2, 0.0), 0.0))
    return {
        "mean": masked_mean(d, mask),
        "median": masked_median(d, mask),
        "quantile": masked_quantile(d, mask, quantile),
    }
