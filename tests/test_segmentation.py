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
