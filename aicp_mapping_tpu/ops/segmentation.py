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


@partial(jax.jit, static_argnames=("k", "max_iters", "jumps_per_iter"))
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
    jumps_per_iter: int = 6,
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
    # gathers (TPU scatters are slow). The (N, k) neighbor pull dominates the
    # round cost (~10x a 1-D jump at k=15: gather throughput is per-element),
    # so each round does ONE pull followed by `jumps_per_iter` cheap label
    # doublings L <- L[L] — the doublings compress paths so min labels
    # travel many graph hops per expensive pull. kNN edges are
    # near-symmetric at these densities, so pull-only reaches the same
    # components as push-pull; the curvature gate is enforced on direct
    # pulls (jumps ride already-assigned labels).
    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        labels, _, it = state
        nbr_labels = labels[idx]                           # (N, k)
        pulled = jnp.min(jnp.where(pull_ok, nbr_labels, n), axis=1)
        new = jnp.minimum(labels, pulled)
        for _ in range(jumps_per_iter):                    # L <- L[L]
            jumped = new[jnp.clip(new, 0, n - 1)]
            new = jnp.where(new < n, jnp.minimum(new, jumped), n)
        new = jnp.where(mask, new, n)
        changed = jnp.any(new != labels)
        return (new, changed, it + 1)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init_labels, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(mask, labels, -1)


@jax.jit
def _compact_unique_keys(keys: jax.Array, valid: jax.Array) -> jax.Array:
    """Map arbitrary non-negative int32 keys to dense ids [0, n_unique) via
    sort; invalid entries -> -1. Pure sort/cumsum — no scatters."""
    n = keys.shape[0]
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    k = jnp.where(valid, keys, big)
    order = jnp.argsort(k)
    ks = k[order]
    starts = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              (ks[1:] != ks[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(starts) - 1                       # (N,) ids in sorted order
    labels_sorted = jnp.where(ks < big, seg, -1)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        labels_sorted.astype(jnp.int32), mode="drop")
    return inv


def _hough_key(points: jax.Array, normals: jax.Array, normal_bins: int,
               offset_res: float) -> jax.Array:
    """Quantized (normal direction, plane offset) hough cell key, packed
    into int31 — shared by `hough_plane_labels` and the fused sorted-space
    prefilter so the two paths cannot drift. int32 key packing (x64 is
    disabled under jit): the normal-cube part needs <= (2*normal_bins+2)^3
    codes and the offset part 12 bits, so normal_bins <= 12 keeps the key
    within int31."""
    q = jnp.round(normals * normal_bins).astype(jnp.int32) + normal_bins
    B = jnp.int32(2 * normal_bins + 2)
    d = jnp.sum(normals * points, axis=-1)
    dq = jnp.clip(jnp.round(d / offset_res).astype(jnp.int32), -2047, 2047)
    return ((q[:, 0] * B + q[:, 1]) * B + q[:, 2]) * jnp.int32(4096) \
        + (dq + 2048)


@partial(jax.jit, static_argnames=("normal_bins",))
def hough_plane_labels(points: jax.Array, mask: jax.Array,
                       normals: jax.Array, curvature: jax.Array,
                       normal_bins: int = 6, offset_res: float = 0.15,
                       curvature_thresh: float = 1.0):
    """Plane clustering by quantized (normal direction, plane offset) bins.

    TPU-native alternative to sequential region growing: two points belong
    to one cluster iff they vote for the same plane cell — normal quantized
    on the cube grid (normal_bins cells per half-axis) and signed offset
    d = n.p quantized at offset_res. O(N) with no neighbor graph and no
    iteration; coplanar-but-disconnected fragments merge (acceptable for the
    alignability semantics — its PCA consumes plane normal directions,
    filteringUtils.cpp:365-400). Normals must be consistently oriented
    (viewpoint flip) so the signed offset is stable within a surface.

    Returns dense labels (N,) int32, -1 for invalid/high-curvature points.
    """
    key = _hough_key(points, normals, normal_bins, offset_res)
    valid = mask & (curvature <= curvature_thresh)
    return _compact_unique_keys(key, valid)


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


def _rev_cummin(x: jax.Array) -> jax.Array:
    return jnp.flip(jax.lax.cummin(jnp.flip(x)))


@partial(jax.jit, static_argnames=("normal_radius", "out_capacity",
                                   "normal_bins"))
def _hough_prefilter_sorted(
    points: jax.Array,
    mask: jax.Array,
    viewpoint: jax.Array | None,
    normal_radius: float,
    curvature_thresh,
    min_cluster_size,
    out_capacity: int,
    normal_bins: int = 6,
    offset_res: float = 0.15,
):
    """Fused sorted-space hough prefilter (the hot path of
    `plane_segmentation_filter`): Morton sort -> banded radius moments ->
    normals -> hough plane binning -> small-cluster filter ->
    cluster-balanced compaction, all carried through payload sorts.

    Same math as the composable ops (`hough_plane_labels`,
    `filter_small_clusters`, `_balanced_compaction_perm`) but ZERO
    gathers/scatters: TPU gathers and scatter-adds run ~130 M elem/s, so
    the legacy chain spent more time permuting arrays (inverse-perm of the
    moment matrix, `segment_sum` cluster sizes, compaction gathers) than
    computing. Here every reorder is a `lax.sort` with the point columns as
    payloads, run lengths come from start/end positions via cummax/cummin
    over the sorted runs, and the output slice IS the final sorted prefix
    (measured on v5e at 16k: 4.4 -> ~2.3 ms). Returns
    (points (C,3), mask (C,), normals (C,3), curvature (C,), labels (C,))
    with kept points compacted to the front — the same contract as
    `plane_segmentation_filter(out_capacity=...)`; output order is the
    cluster-balanced round-robin order, not input order."""
    from .banded_nn import morton_codes
    from .normals import moments_to_normals
    from .knn import _on_tpu
    from .normals import (_radius_moments_pallas, _radius_moments_xla,
                          sorted_radius_moments_split)

    n = points.shape[0]
    big_f = jnp.float32(3.4e38)
    sent = jnp.int32(2**31 - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    # ---- 1. Morton sort, point columns as payloads ----
    origin = jnp.min(jnp.where(mask[:, None], points, big_f), axis=0)
    codes = morton_codes(points, mask, origin, jnp.float32(2.0))
    codes_s, xs, ys, zs = jax.lax.sort(
        (codes, points[:, 0], points[:, 1], points[:, 2]), num_keys=1)
    ms = codes_s != sent
    ps = jnp.stack([xs, ys, zs], axis=1)

    # ---- 2. radius moments in sorted space -> normals/curvature ----
    if _on_tpu() and n >= 16384 and n % 1024 == 0 and n % 512 == 0:
        M = sorted_radius_moments_split(ps, ms, codes_s, normal_radius)
    elif _on_tpu() and n % 1024 == 0 and n % 512 == 0:
        M = _radius_moments_pallas(ps, ms, normal_radius)
    else:
        M = _radius_moments_xla(ps, ms, normal_radius)
    normals, curvature, _ = moments_to_normals(M, ps, ms, viewpoint)

    # ---- 3. hough plane key (shared packing with hough_plane_labels) ----
    hkey = _hough_key(ps, normals, normal_bins, offset_res)
    valid = ms & (curvature <= curvature_thresh)
    hkey = jnp.where(valid, hkey, sent)

    # ---- 4. cluster-grouping sort (stable: spatial order within runs) ----
    k2, x2, y2, z2, nx2, ny2, nz2, c2 = jax.lax.sort(
        (hkey, ps[:, 0], ps[:, 1], ps[:, 2],
         normals[:, 0], normals[:, 1], normals[:, 2], curvature), num_keys=1)
    valid2 = k2 != sent
    prev = jnp.concatenate([jnp.full((1,), -2, k2.dtype), k2[:-1]])
    nxt = jnp.concatenate([k2[1:], jnp.full((1,), -3, k2.dtype)])
    is_start = k2 != prev
    is_end = k2 != nxt
    label = jnp.cumsum(is_start.astype(jnp.int32)) - 1       # dense ids
    start_pos = jax.lax.cummax(jnp.where(is_start, iota, 0))
    end_pos = _rev_cummin(jnp.where(is_end, iota, n - 1))
    size = end_pos - start_pos + 1                           # run length
    keep = valid2 & (size >= min_cluster_size)
    pos = iota - start_pos                                   # rank in run

    # ---- 5. bit-reversed reorder within cluster (spreads any kept
    #         prefix uniformly across the cluster's spatial extent) ----
    lbl_k = jnp.where(keep, label, sent)
    k3, _, x3, y3, z3, nx3, ny3, nz3, c3, l3 = jax.lax.sort(
        (lbl_k, _bitrev17(pos), x2, y2, z2, nx2, ny2, nz2, c2, label),
        num_keys=2)
    is_start3 = k3 != jnp.concatenate([jnp.full((1,), -2, k3.dtype), k3[:-1]])
    rank = iota - jax.lax.cummax(jnp.where(is_start3, iota, 0))
    kept3 = k3 != sent
    rank_k = jnp.where(kept3, rank, sent)

    # ---- 6. round-robin across clusters: rank-major final order ----
    _, _, x4, y4, z4, nx4, ny4, nz4, c4, l4 = jax.lax.sort(
        (rank_k, k3, x3, y3, z3, nx3, ny3, nz3, c3,
         jnp.where(kept3, l3, -1)), num_keys=2)
    kept_total = jnp.sum(kept3.astype(jnp.int32))
    out_mask = iota[:out_capacity] < kept_total
    out_pts = jnp.stack([x4, y4, z4], axis=1)[:out_capacity]
    out_nrm = jnp.stack([nx4, ny4, nz4], axis=1)[:out_capacity]
    return (
        jnp.where(out_mask[:, None], out_pts, 0.0),
        out_mask,
        jnp.where(out_mask[:, None], out_nrm, 0.0),
        jnp.where(out_mask, c4[:out_capacity], 0.0),
        jnp.where(out_mask, l4[:out_capacity], -1),
    )


@partial(jax.jit, static_argnames=("normal_k", "graph_k", "out_capacity",
                                   "method", "normal_radius"))
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
    method: str = "hough",
    normal_radius: float = 0.4,
):
    """Planes-only retention on an already-downsampled cloud.

    Equivalent of `regionGrowingUniformPlaneSegmentationFilter`'s
    normal-estimation + region-growing + cluster-keep stages
    (filteringUtils.cpp:15-45) — voxel downsampling is done separately by
    `ops.voxel.voxel_downsample` (leaf 0.08 m).

    Returns (points, mask, normals, curvature, labels); when `out_capacity`
    is given, kept points are compacted to that capacity in cluster-balanced
    round-robin order (see `_balanced_compaction_perm`).

    method="hough" (default): gather-free radius normals + quantized
    (normal, offset) plane binning — O(N) matmuls + one sort, ~10x faster
    on TPU than graph propagation. method="region_growing": one approximate
    kNN build shared between normal estimation and bounded-iteration
    min-label propagation — closer to PCL's connectivity semantics.
    """
    if method == "hough" and out_capacity is not None:
        # Fused sorted-space fast path: same math, zero gathers/scatters.
        return _hough_prefilter_sorted(
            points, mask, viewpoint, normal_radius, curvature_thresh,
            min_cluster_size, out_capacity)
    if method == "hough":
        from .normals import radius_normals

        normals, curvature, _ = radius_normals(points, mask, normal_radius,
                                               viewpoint)
        labels = hough_plane_labels(points, mask, normals, curvature,
                                    curvature_thresh=curvature_thresh)
    elif method == "region_growing":
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
    else:
        raise ValueError(f"unknown segmentation method {method!r}")
    keep = filter_small_clusters(labels, mask, min_cluster_size)

    if out_capacity is None:
        return points, keep, normals, curvature, labels

    perm = _balanced_compaction_perm(labels, keep)[:out_capacity]
    return (
        points[perm],
        keep[perm],
        normals[perm],
        curvature[perm],
        labels[perm],
    )


def _bitrev17(x: jax.Array) -> jax.Array:
    """Reverse the low 17 bits (supports capacities up to 131072)."""
    r = jnp.zeros_like(x)
    for i in range(17):
        r = r | (((x >> i) & 1) << (16 - i))
    return r


def _balanced_compaction_perm(labels: jax.Array, keep: jax.Array) -> jax.Array:
    """Cluster-balanced, spatially spread selection order for capacity
    truncation.

    Truncating kept points in raw index order is a silent failure mode at
    capacity saturation: the upstream voxel sort leaves points in spatial
    (voxel-key) order, so the tail that gets cut is a spatially CONTIGUOUS
    region — entire far walls vanish and ICP loses whole constraint
    directions with no runtime fault. Instead, points are selected
    round-robin across clusters (rank within cluster), and within each
    cluster in bit-reversed positional order, so a cluster that only keeps
    a prefix keeps a uniformly spread subset rather than one end of the
    wall. Three lax.sorts of (int32 x2) rows — negligible next to the
    prefilter's normal pass. When nothing overflows, the SELECTED SET is
    unchanged (all kept points), only the output ordering differs."""
    n = labels.shape[0]
    big = jnp.int32(2 ** 30)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    lbl = jnp.where(keep, labels, big)

    # group by cluster (stable: spatial order within each cluster)
    _, idx1 = jax.lax.sort((lbl, idx), num_keys=1)
    lbl1 = lbl[idx1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    starts = jnp.concatenate([jnp.ones((1,), bool), lbl1[1:] != lbl1[:-1]])
    start_pos = jax.lax.cummax(jnp.where(starts, iota, 0))
    pos = iota - start_pos                       # spatial rank within cluster

    # reorder within cluster by bit-reversed position (spreads any prefix
    # uniformly across the cluster), then recompute the rank
    _, _, idx2 = jax.lax.sort((lbl1, _bitrev17(pos), idx1), num_keys=2)
    # grouping (and hence start positions) is unchanged by the within-
    # cluster reorder
    rank = pos
    keep2 = keep[idx2]

    # round-robin across clusters: rank-r points of every cluster before
    # any rank-(r+1) point; unkept rows sort to the back
    sel_key = jnp.where(keep2, rank, big)
    _, perm = jax.lax.sort((sel_key, idx2), num_keys=1)
    return perm
