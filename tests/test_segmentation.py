import jax.numpy as jnp
import numpy as np
import pytest

from aicp_mapping_tpu.cloud import Cloud
from aicp_mapping_tpu.ops import estimate_normals
from aicp_mapping_tpu.ops.segmentation import (
    compact_labels,
    filter_small_clusters,
    label_propagation_clusters,
    plane_segmentation_filter,
)


def two_planes(n=400, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-2, 2, (n, 2))
    floor = np.concatenate([a, np.zeros((n, 1))], axis=1)          # z=0
    wall = np.stack([a[:, 0], np.full(n, 3.0), a[:, 1] + 2.0], 1)  # y=3
    return np.concatenate([floor, wall]).astype(np.float32)


def test_two_planes_two_clusters():
    pts = two_planes()
    c = Cloud.from_numpy(pts, capacity=1024)
    normals, curv, _ = estimate_normals(c.points, c.mask, k=12)
    labels = label_propagation_clusters(c.points, c.mask, normals, curv, k=10)
    lab = np.asarray(labels)
    m = np.asarray(c.mask)
    roots = set(lab[m].tolist())
    assert len(roots) == 2, roots
    # floor points all share one root, wall points another
    assert len(set(lab[:400].tolist())) == 1
    assert len(set(lab[400:800].tolist())) == 1


def test_filter_small_clusters():
    pts = two_planes(n=400)
    # add a tiny 5-point blob far away
    blob = np.tile(np.array([[50.0, 50.0, 50.0]], np.float32), (5, 1))
    blob += np.random.default_rng(1).normal(0, 0.01, blob.shape).astype(np.float32)
    c = Cloud.from_numpy(np.concatenate([pts, blob]), capacity=1024)
    normals, curv, _ = estimate_normals(c.points, c.mask, k=12)
    labels = label_propagation_clusters(c.points, c.mask, normals, curv, k=10)
    keep = filter_small_clusters(labels, c.mask, min_cluster_size=50)
    k = np.asarray(keep)
    assert k[:800].all()
    assert not k[800:805].any()


def test_compact_labels_ranks_by_size():
    labels = jnp.asarray(np.array([0] * 10 + [20] * 30 + [50] * 20, np.int32))
    mask = jnp.ones((60,), bool)
    comp, valid, sizes = compact_labels(labels, mask, max_clusters=4)
    comp = np.asarray(comp)
    assert (comp[10:40] == 0).all()   # biggest cluster -> rank 0
    assert (comp[40:60] == 1).all()
    assert (comp[:10] == 2).all()
    assert list(np.asarray(sizes)) == [30, 20, 10, 0]


def test_plane_segmentation_filter_compacts():
    pts = two_planes(n=300)
    c = Cloud.from_numpy(pts, capacity=1024)
    fpts, fmask, fnorm, fcurv, flab = plane_segmentation_filter(
        c.points, c.mask, normal_k=12, graph_k=10, out_capacity=640)
    assert fpts.shape == (640, 3)
    n_kept = int(jnp.sum(fmask))
    # hough binning may drop a few bin-edge points; >=97% of plane points
    # must survive, compacted to the front
    assert n_kept >= 0.97 * 600, n_kept
    assert bool(jnp.all(fmask[:n_kept]))


def test_capacity_overflow_keeps_all_clusters_spread():
    """Capacity truncation must be cluster-balanced and spatially spread:
    raw-index truncation cuts a spatially contiguous chunk (the voxel sort
    leaves spatial order), silently deleting whole far walls. With a
    dominant ground cluster and two sparse walls at out_capacity << kept
    count, every cluster must survive, and each cluster's retained points
    must span its extent rather than one end."""
    from aicp_mapping_tpu.ops.segmentation import plane_segmentation_filter

    rng = np.random.default_rng(0)
    n_g, n_w = 3000, 500
    g = np.stack([rng.uniform(-10, 10, n_g), rng.uniform(-10, 10, n_g),
                  np.zeros(n_g)], 1)
    wx = np.stack([np.full(n_w, 8.0), rng.uniform(-10, 10, n_w),
                   rng.uniform(0.2, 3, n_w)], 1)
    wy = np.stack([rng.uniform(-10, 10, n_w), np.full(n_w, -9.0),
                   rng.uniform(0.2, 3, n_w)], 1)
    pts = np.concatenate([g, wx, wy]).astype(np.float32)
    pts += rng.normal(0, 0.004, pts.shape).astype(np.float32)
    cloud = Cloud.from_numpy(pts, capacity=4096)

    cap = 1024  # far below the ~4000 kept points
    fpts, fmask, fnrm, _, _ = plane_segmentation_filter(
        cloud.points, cloud.mask, viewpoint=jnp.zeros(3, jnp.float32),
        normal_k=12, graph_k=8, smoothness_deg=10.0, min_cluster_size=50,
        out_capacity=cap, method="region_growing")
    out = np.asarray(fpts)[np.asarray(fmask)]
    nrm = np.abs(np.asarray(fnrm)[np.asarray(fmask)])
    assert len(out) == cap

    # classify retained points by dominant normal axis
    axis = np.argmax(nrm, axis=1)
    counts = np.bincount(axis, minlength=3)
    # all three orientation classes survive with a real share
    assert counts.min() > cap // 8, counts
    # spread: the x-wall's retained points span most of its y extent
    xwall = out[(axis == 0)]
    if len(xwall) > 10:
        span = xwall[:, 1].max() - xwall[:, 1].min()
        assert span > 12.0, span  # wall is 20 m wide
    # ground spans both x and y
    ground = out[axis == 2]
    assert ground[:, 0].max() - ground[:, 0].min() > 14.0
    assert ground[:, 1].max() - ground[:, 1].min() > 14.0
