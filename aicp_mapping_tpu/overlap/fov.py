"""Field-of-view (frustum) overlap between two sensor views.

TPU-native equivalent of `overlapFilter` (filteringUtils.cpp:111-193): each
cloud is tested for membership in the *other* sensor's field of view
(azimuth window + range), and

    overlap = fracA_in_fovB * fracB_in_fovA * 100.

Also returns the in-FOV masks so the alignability filter can run on the
overlap region only (app.cpp:148-167).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3


@jax.jit
def _in_fov(points, mask, pose, sensor_range, angular_view_deg):
    """Membership of world-frame points in the sensor frustum at `pose`.

    thresh = 180 - (360 - angularView)/2, accept |theta| < thresh and
    r < range (filteringUtils.cpp:117-136).
    """
    local = se3.transform_points(se3.inverse(pose), points)
    r = jnp.linalg.norm(local, axis=-1)
    theta = jnp.rad2deg(jnp.arctan2(local[..., 1], local[..., 0]))
    thresh = 180.0 - (360.0 - angular_view_deg) / 2.0
    ok = (theta < thresh) & (theta > -thresh) & (r < sensor_range)
    return mask & ok


@jax.jit
def fov_overlap(points_a, mask_a, pose_a, points_b, mask_b, pose_b,
                sensor_range=100.0, angular_view_deg=360.0):
    """Returns (overlap_percent, maskA_in_fovB, maskB_in_fovA)."""
    a_in_b = _in_fov(points_a, mask_a, pose_b, sensor_range, angular_view_deg)
    b_in_a = _in_fov(points_b, mask_b, pose_a, sensor_range, angular_view_deg)
    na = jnp.maximum(jnp.sum(mask_a.astype(jnp.float32)), 1.0)
    nb = jnp.maximum(jnp.sum(mask_b.astype(jnp.float32)), 1.0)
    frac_a = jnp.sum(a_in_b.astype(jnp.float32)) / na
    frac_b = jnp.sum(b_in_a.astype(jnp.float32)) / nb
    return frac_a * frac_b * 100.0, a_in_b, b_in_a
