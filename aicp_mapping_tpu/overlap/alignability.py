"""Alignability: geometric constraint analysis for failure prediction.

TPU-native re-design of `alignabilityFilter` (filteringUtils.cpp:196-429),
the ICRA'18 alignment-risk feature:

  1. downsample + plane-segment both overlap-region clouds
  2. match planes across clouds by oriented-bounding-box co-membership and
     normals-centroid angle < 20 deg (filteringUtils.cpp:236-286)
  3. PCA of the matched reference-cloud normals on the unit sphere (with
     mirrored copies); alignability = 100 * lambda_min / lambda_max
     ("scattering", filteringUtils.cpp:365-400) — near 0 means the matched
     constraints span a degenerate set of directions.

Everything is fixed-shape: clusters are compacted to the top `max_clusters`
by size; cross-cluster box counts are a single (C_A, N_B) x (N_B, C_B)
matmul on the MXU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.segmentation import (
    compact_labels,
    filter_small_clusters,
    label_propagation_clusters,
)
from ..ops.normals import estimate_normals
from ..ops.voxel import voxel_downsample
from ..geometry import se3


def _cluster_stats(points, normals, labels, n_clusters):
    """Per-cluster size, normals centroid, OBB (mean, axes, extents)."""
    n = points.shape[0]
    seg = jnp.where(labels >= 0, labels, n_clusters)
    valid = (labels >= 0).astype(points.dtype)

    size = jax.ops.segment_sum(valid, seg, num_segments=n_clusters + 1)[:n_clusters]
    size_safe = jnp.maximum(size, 1.0)

    nsum = jax.ops.segment_sum(normals * valid[:, None], seg,
                               num_segments=n_clusters + 1)[:n_clusters]
    normals_centroid = nsum / size_safe[:, None]  # NOT normalized (reference
    # computeNormalsCentroid, filteringUtils.cpp:432-444)

    psum = jax.ops.segment_sum(points * valid[:, None], seg,
                               num_segments=n_clusters + 1)[:n_clusters]
    mean = psum / size_safe[:, None]

    centered = (points - mean[jnp.clip(labels, 0, n_clusters - 1)]) * valid[:, None]
    outer = jnp.einsum("ni,nj->nij", centered, centered)
    cov = jax.ops.segment_sum(outer, seg, num_segments=n_clusters + 1)[:n_clusters]
    cov = cov / size_safe[:, None, None]

    # OBB axes: eigenvectors of the cluster covariance, descending so local z
    # is the minor (plane-normal) axis — matches PCL MomentOfInertiaEstimation
    # OBB frame used at filteringUtils.cpp:447-477.
    evals, evecs = jnp.linalg.eigh(cov)          # ascending
    axes = evecs[..., ::-1]                      # columns: major, middle, minor

    # Extents: min/max of member points in the OBB frame (relative to mean).
    local = jnp.einsum("nj,nji->ni", centered,
                       axes[jnp.clip(labels, 0, n_clusters - 1)])
    big = jnp.float32(3.4e38)
    loc_valid = jnp.where(valid[:, None] > 0, local, big)
    lo = jax.ops.segment_min(loc_valid, seg, num_segments=n_clusters + 1)[:n_clusters]
    loc_valid = jnp.where(valid[:, None] > 0, local, -big)
    hi = jax.ops.segment_max(loc_valid, seg, num_segments=n_clusters + 1)[:n_clusters]
    lo = jnp.where(size[:, None] > 0, lo, 0.0)
    hi = jnp.where(size[:, None] > 0, hi, 0.0)
    return size, normals_centroid, mean, axes, lo, hi


def _points_in_boxes(points, labels, n_clusters_pts, box_mean, box_axes,
                     box_lo, box_hi, z_scale):
    """counts[i, j] = #points of cluster j inside (z-enlarged) OBB of box i.

    The z extent is scaled by `z_scale` (reference enlarges the
    plane-perpendicular direction 3x, filteringUtils.cpp:527-528).
    """
    c_box = box_mean.shape[0]
    scale = jnp.array([1.0, 1.0, z_scale], dtype=points.dtype)
    lo = box_lo * scale
    hi = box_hi * scale
    # local[i, p, :] = axes_i^T (p - mean_i)
    rel = points[None, :, :] - box_mean[:, None, :]          # (C, N, 3)
    local = jnp.einsum("cnj,cji->cni", rel, box_axes)        # (C, N, 3)
    inside = jnp.all((local >= lo[:, None, :]) & (local <= hi[:, None, :]),
                     axis=-1)                                 # (C, N)
    onehot = (labels[:, None] ==
              jnp.arange(n_clusters_pts)[None, :]).astype(points.dtype)  # (N, Cj)
    return inside.astype(points.dtype) @ onehot               # (C, Cj) — MXU


@partial(jax.jit, static_argnames=("ds_capacity", "max_clusters", "normal_k",
                                   "graph_k"))
def alignability_filter(
    points_a: jax.Array, mask_a: jax.Array, pose_a: jax.Array,
    points_b: jax.Array, mask_b: jax.Array, pose_b: jax.Array,
    voxel_size: float = 0.08,
    ds_capacity: int = 8192,
    max_clusters: int = 32,
    normal_k: int = 30,
    graph_k: int = 15,
    smoothness_deg: float = 3.0,
    min_cluster_size: int = 50,
    max_centroid_angle_deg: float = 20.0,
    z_scale: float = 3.0,
):
    """Returns (alignability in [0, 100], diagnostics dict).

    A is the reference cloud, B the reading cloud, both in world frame
    (the reference calls this on the FOV-overlap subsets, app.cpp:148-167).
    """

    def segment(points, mask, pose):
        dpts, dmask = voxel_downsample(points, mask, voxel_size, ds_capacity)
        normals, curvature, _ = estimate_normals(
            dpts, dmask, normal_k, viewpoint=se3.translation(pose))
        labels = label_propagation_clusters(
            dpts, dmask, normals, curvature, k=graph_k,
            smoothness_deg=smoothness_deg)
        keep = filter_small_clusters(labels, dmask, min_cluster_size)
        labels = jnp.where(keep, labels, -1)
        comp, cvalid, csize = compact_labels(labels, keep, max_clusters)
        return dpts, normals, comp, cvalid

    pts_a, nrm_a, lab_a, valid_a = segment(points_a, mask_a, pose_a)
    pts_b, nrm_b, lab_b, valid_b = segment(points_b, mask_b, pose_b)

    size_a, nc_a, mean_a, axes_a, lo_a, hi_a = _cluster_stats(
        pts_a, nrm_a, lab_a, max_clusters)
    size_b, nc_b, mean_b, axes_b, lo_b, hi_b = _cluster_stats(
        pts_b, nrm_b, lab_b, max_clusters)

    # --- plane matching (filteringUtils.cpp:236-286) ---
    # angle between normals centroids, degrees
    na = jnp.linalg.norm(nc_a, axis=-1)
    nb = jnp.linalg.norm(nc_b, axis=-1)
    dots = nc_a @ nc_b.T / jnp.maximum(na[:, None] * nb[None, :], 1e-12)
    ang = jnp.rad2deg(jnp.arccos(jnp.clip(dots, -1.0, 1.0)))   # (Ca, Cb)

    # box overlap: fracA-in-boxB * fracB-in-boxA * 100
    cnt_b_in_a = _points_in_boxes(pts_b, lab_b, max_clusters,
                                  mean_a, axes_a, lo_a, hi_a, z_scale)  # (Ca, Cb)
    cnt_a_in_b = _points_in_boxes(pts_a, lab_a, max_clusters,
                                  mean_b, axes_b, lo_b, hi_b, z_scale)  # (Cb, Ca)
    frac_b = cnt_b_in_a / jnp.maximum(size_b[None, :], 1.0)
    frac_a = cnt_a_in_b.T / jnp.maximum(size_a[:, None], 1.0)
    box_overlap = frac_a * frac_b * 100.0                       # (Ca, Cb)

    pair_ok = (
        (ang < max_centroid_angle_deg)
        & valid_a[:, None] & valid_b[None, :]
    )
    scored = jnp.where(pair_ok, box_overlap, -1.0)
    best_j = jnp.argmax(scored, axis=1)                          # per A cluster
    best_ov = jnp.max(scored, axis=1)
    has_match = best_ov > 0.0

    # Conflict resolution: each B cluster keeps only the A cluster with the
    # largest overlap (filteringUtils.cpp:266-285).
    claim = jnp.where(
        has_match[:, None]
        & (best_j[:, None] == jnp.arange(max_clusters)[None, :]),
        best_ov[:, None], -1.0)                                  # (Ca, Cb)
    winner_a = jnp.argmax(claim, axis=0)                         # per B cluster
    claimed = jnp.max(claim, axis=0) > 0.0
    matched_a = jnp.zeros((max_clusters,), dtype=bool)
    matched_a = matched_a.at[jnp.where(claimed, winner_a, max_clusters - 1)].max(
        claimed)

    # --- PCA of matched reference normals on the unit sphere ---
    # Mirrored copies make the mean exactly zero, so the PCA covariance is
    # the plain second moment of the matched normals.
    point_matched = (lab_a >= 0) & matched_a[jnp.clip(lab_a, 0, max_clusters - 1)]
    w = point_matched.astype(pts_a.dtype)
    m2 = jnp.einsum("n,ni,nj->ij", w, nrm_a, nrm_a)
    evals = jnp.linalg.eigvalsh(m2)                              # ascending
    lam_min = jnp.maximum(evals[0], 0.0)
    lam_max = jnp.maximum(evals[2], 1e-12)
    alignability = jnp.where(jnp.sum(w) > 0, 100.0 * lam_min / lam_max, 0.0)

    diagnostics = {
        "matched_a": matched_a,
        "box_overlap": box_overlap,
        "centroid_angle": ang,
        "n_matched_points": jnp.sum(w),
        "eigvals": evals,
    }
    return alignability, diagnostics
