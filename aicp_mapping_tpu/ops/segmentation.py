"""Plane segmentation by parallel region growing (label propagation).

TPU-native reformulation of PCL RegionGrowing as used by the reference
pre-filter (filteringUtils.cpp:25-36: MinClusterSize 50, neighbours 15,
smoothness 3 deg, curvature threshold 1.0). Sequential seed-and-grow does not
map to SIMD hardware; instead we run bounded-iteration min-label propagation
over the kNN graph, which produces the same connected smooth-surface
components: two points end in one cluster iff they are connected by a chain
of neighbor pairs whose normals differ by less than the smoothness angle.

The cluster quality is validated against alignability agreement rather than
exact PCL parity (the reference's own clusters depend on seed ordering).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .knn import knn
from .normals import estimate_normals


@partial(jax.jit, static_argnames=("k", "max_iters"))
def label_propagation_clusters(
    points: jax.Array,      # (N, 3)
    mask: jax.Array,        # (N,)
    normals: jax.Array,     # (N, 3)
    curvature: jax.Array,   # (N,)
    k: int = 15,
    smoothness_deg: float = 3.0,
    curvature_thresh: float = 1.0,
    max_iters: int = 64,
    neighbor_idx: jax.Array | None = None,
):
    """Min-label propagation over the smoothness graph.

    Returns labels (N,) int32: the minimum point index of each cluster
    (root id), or -1 for invalid points. Points whose curvature exceeds
    `curvature_thresh` may join a cluster but do not forward labels —
    matching PCL's seed gating. Pass `neighbor_idx` (N, >=k) to reuse a
    kNN build; its first k columns are used.
    """
    n = points.shape[0]
    if neighbor_idx is None:
        _, idx = knn(points, mask, points, mask, k)      # (N, k)
    else:
        idx = neighbor_idx[:, :k]
    cos_thresh = jnp.cos(jnp.deg2rad(smoothness_deg))

    nbr_normals = normals[idx]                            # (N, k, 3)
    dots = jnp.abs(jnp.einsum("nd,nkd->nk", normals, nbr_normals))
    nbr_ok = (
        (dots >= cos_thresh)
        & mask[:, None]
        & mask[idx]
    )
    can_forward = (curvature <= curvature_thresh) & mask
    pull_ok = nbr_ok & can_forward[idx]

    init_labels = jnp.where(
        mask, jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0], jnp.int32(n)
    )

    # Pull-only propagation + pointer jumping: every iteration is pure
    # gathers (TPU scatters are slow), and label doubling L <- L[L] gives
    # O(log N) convergence. kNN edges are near-symmetric at these densities,
    # so pull-only reaches the same components as push-pull; the curvature
    # gate is enforced on direct pulls (jumps ride already-assigned labels).
    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        nbr_labels = labels[idx]                           # (N, k)
        pulled = jnp.min(jnp.where(pull_ok, nbr_labels, n), axis=1)
        new = jnp.minimum(labels, pulled)
        # pointer jump twice: L <- L[L]
        for _ in range(2):
            jumped = new[jnp.clip(new, 0, n - 1)]
            new = jnp.where(new < n, jnp.minimum(new, jumped), n)
        new = jnp.where(mask, new, n)
        changed = jnp.any(new != labels)
        return (new, changed, it + 1)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init_labels, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(mask, labels, -1)


@partial(jax.jit, static_argnames=("k",))
def filter_small_clusters(labels: jax.Array, mask: jax.Array,
                          min_cluster_size: int = 50, k: int = 0):
    """Mask out points whose cluster has fewer than `min_cluster_size` points
    (PCL setMinClusterSize(50), filteringUtils.cpp:27)."""
    n = labels.shape[0]
    seg = jnp.where(labels >= 0, labels, n)
    sizes = jax.ops.segment_sum(mask.astype(jnp.int32), seg, num_segments=n + 1)
    keep = sizes[jnp.clip(labels, 0, n)] >= min_cluster_size
    return mask & keep & (labels >= 0)


@partial(jax.jit, static_argnames=("max_clusters",))
def compact_labels(labels: jax.Array, mask: jax.Array, max_clusters: int):
    """Rank clusters by size and relabel to [0, max_clusters); others/-1 -> -1.

    Returns (compact_labels (N,), cluster_valid (C,), cluster_sizes (C,)).
    """
    n = labels.shape[0]
    seg = jnp.where((labels >= 0) & mask, labels, n)
    sizes = jax.ops.segment_sum(mask.astype(jnp.int32), seg, num_segments=n + 1)[:n]
    # top-C root ids by size
    top_sizes, top_roots = jax.lax.top_k(sizes, max_clusters)
    cluster_valid = top_sizes > 0
    # map each point's root to its rank (or -1)
    rank_of_root = jnp.full((n + 1,), -1, dtype=jnp.int32)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (max_clusters, 1), 0)[:, 0]
    rank_of_root = rank_of_root.at[jnp.where(cluster_valid, top_roots, n)].set(
        jnp.where(cluster_valid, ranks, -1)
    )
    comp = rank_of_root[jnp.clip(labels, 0, n)]
    comp = jnp.where((labels >= 0) & mask, comp, -1)
    return comp, cluster_valid, top_sizes


@partial(jax.jit, static_argnames=("normal_k", "graph_k", "out_capacity"))
def plane_segmentation_filter(
    points: jax.Array,
    mask: jax.Array,
    viewpoint: jax.Array | None = None,
    normal_k: int = 30,
    graph_k: int = 15,
    smoothness_deg: float = 3.0,
    curvature_thresh: float = 1.0,
    min_cluster_size: int = 50,
    out_capacity: int | None = None,
):
    """Planes-only retention on an already-downsampled cloud.

    Equivalent of `regionGrowingUniformPlaneSegmentationFilter`'s
    normal-estimation + region-growing + cluster-keep stages
    (filteringUtils.cpp:15-45) — voxel downsampling is done separately by
    `ops.voxel.voxel_downsample` (leaf 0.08 m).

    Returns (points, mask, normals, curvature, labels); when `out_capacity`
    is given, kept points are compacted to that capacity (order preserved).

    One approximate kNN build (k = normal_k) is shared between normal
    estimation and the region-growing graph (its nearest graph_k columns).
    """
    from .knn import knn as _knn
    from .normals import normals_from_neighbors

    _, nbr_idx = _knn(points, mask, points, mask, normal_k, approx=True)
    normals, curvature, _ = normals_from_neighbors(points, mask, nbr_idx,
                                                   viewpoint)
    labels = label_propagation_clusters(
        points, mask, normals, curvature,
        k=graph_k, smoothness_deg=smoothness_deg,
        curvature_thresh=curvature_thresh,
        neighbor_idx=nbr_idx,
    )
    keep = filter_small_clusters(labels, mask, min_cluster_size)

    if out_capacity is None:
        return points, keep, normals, curvature, labels

    n = points.shape[0]
    order_key = jnp.where(keep, 0, 1).astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    _, perm = jax.lax.sort((order_key, idx), num_keys=1)  # stable: kept first
    perm = perm[:out_capacity]
    return (
        points[perm],
        keep[perm],
        normals[perm],
        curvature[perm],
        labels[perm],
    )
