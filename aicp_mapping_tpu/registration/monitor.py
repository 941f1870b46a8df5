"""ICP quality monitoring: Hausdorff distance, residual statistics.

TPU-native analog of aicp_core/src/utils/icpMonitor.cpp:
  - hausdorffDistance (+ robust quantile variant, icpMonitor.cpp:12-81)
  - per-point KNN distances (icpMonitor.cpp:89-138)
  - residual mean/median/quantile (icpMonitor.cpp:233-252)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.knn import nn_argmin_xla
from ..ops.quantile import masked_mean, masked_median, masked_quantile

_BIG = jnp.float32(3.4e38)


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
def residual_stats(dist2, mask, quantile=0.75):
    """Mean / median / quantile of NN residual distances (meters)."""
    d = jnp.sqrt(jnp.maximum(jnp.where(mask, dist2, 0.0), 0.0))
    return {
        "mean": masked_mean(d, mask),
        "median": masked_median(d, mask),
        "quantile": masked_quantile(d, mask, quantile),
    }
