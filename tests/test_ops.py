import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aicp_mapping_tpu import ops
from aicp_mapping_tpu.cloud import Cloud


def make_cloud(key, n, cap, spread=5.0):
    pts = jax.random.uniform(key, (n, 3), minval=-spread, maxval=spread)
    c = Cloud.from_numpy(np.asarray(pts), capacity=cap)
    return c


# ---------------------------- voxel ----------------------------------------

def test_voxel_downsample_basic():
    # 8 points in 2 distinct voxels -> 2 centroids
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.03, 0.01, 0.02], [0.02, 0.03, 0.01],
         [1.01, 1.01, 1.01], [1.02, 1.02, 1.02], [1.03, 1.01, 1.02], [1.02, 1.03, 1.01]],
        dtype=np.float32,
    )
    c = Cloud.from_numpy(pts, capacity=16)
    out, mask = ops.voxel_downsample(c.points, c.mask, 0.5, capacity=8)
    got = np.asarray(out)[np.asarray(mask)]
    assert got.shape[0] == 2
    centroids = np.stack([pts[:4].mean(0), pts[4:].mean(0)])
    d = np.linalg.norm(got[:, None] - centroids[None], axis=-1)
    assert d.min(axis=1).max() < 1e-5


def test_voxel_downsample_respects_mask():
    pts = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]], dtype=np.float32)
    c = Cloud.from_numpy(pts, capacity=8)
    mask = np.asarray(c.mask).copy()
    mask[1] = False  # invalidate second point
    out, omask = ops.voxel_downsample(c.points, jnp.asarray(mask), 0.1, capacity=4)
    assert int(jnp.sum(omask)) == 1


def test_unique_voxel_count():
    pts = np.array([[0.0, 0.0, 0.0], [0.05, 0.05, 0.0], [1.0, 0.0, 0.0],
                    [0.0, 1.0, 0.0]], dtype=np.float32)
    c = Cloud.from_numpy(pts, capacity=8)
    assert int(ops.unique_voxel_count(c.points, c.mask, 0.2)) == 3


def test_voxel_set_overlap():
    a = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]], dtype=np.float32)
    b = np.array([[0.05, 0.0, 0.0], [1.05, 0.0, 0.0], [9.0, 0.0, 0.0]], dtype=np.float32)
    ca = Cloud.from_numpy(a, capacity=8)
    cb = Cloud.from_numpy(b, capacity=8)
    n_common, na, nb = ops.voxel_set_overlap(ca.points, ca.mask, cb.points, cb.mask, 0.2)
    assert (int(n_common), int(na), int(nb)) == (2, 3, 3)


def test_crop_box():
    pts = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.5, 0.5, 0.5]], dtype=np.float32)
    c = Cloud.from_numpy(pts, capacity=4)
    from aicp_mapping_tpu.geometry import se3
    mask = ops.crop_box(c.points, c.mask, se3.identity(), -1.0, 1.0)
    assert list(np.asarray(mask)) == [True, False, True, False]


# ---------------------------- nn / knn --------------------------------------

def test_nn_argmin_xla_matches_bruteforce():
    key = jax.random.PRNGKey(0)
    q = make_cloud(key, 100, 128)
    r = make_cloud(jax.random.PRNGKey(1), 200, 256)
    dist, idx = ops.nn_argmin_xla(q.points, q.mask, r.points, r.mask, block=32)
    qn, rn = np.asarray(q.points), np.asarray(r.points)
    d_full = ((qn[:, None] - rn[None]) ** 2).sum(-1)
    d_full[:, ~np.asarray(r.mask)] = np.inf
    m = np.asarray(q.mask)
    # Chosen index must achieve the true min distance (ties may break either way)
    chosen = d_full[np.arange(len(qn)), np.asarray(idx)]
    np.testing.assert_allclose(chosen[m], d_full.min(1)[m], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dist)[m], d_full.min(1)[m], rtol=1e-4, atol=1e-4)


def test_nn_argmin_pallas_interpret_matches_xla():
    key = jax.random.PRNGKey(2)
    M, N = 512, 1024
    q = jax.random.uniform(key, (M, 3), minval=-3, maxval=3)
    r = jax.random.uniform(jax.random.PRNGKey(3), (N, 3), minval=-3, maxval=3)
    qmask = jnp.arange(M) < 400
    rmask = jnp.arange(N) < 900
    d1, i1 = ops.nn_argmin_xla(q, qmask, r, rmask)
    d2, i2 = ops.nn_argmin_pallas(q, qmask, r, rmask, tm=256, tn=256, interpret=True)
    m = np.asarray(qmask)
    np.testing.assert_array_equal(np.asarray(i1)[m], np.asarray(i2)[m])
    np.testing.assert_allclose(np.asarray(d1)[m], np.asarray(d2)[m], rtol=1e-4, atol=1e-4)


def test_knn_self_first():
    c = make_cloud(jax.random.PRNGKey(4), 64, 64)
    dist, idx = ops.knn(c.points, c.mask, c.points, c.mask, k=4, block=32)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(64))
    assert float(jnp.max(dist[:, 0])) < 1e-6


# ---------------------------- normals ---------------------------------------

def test_normals_on_plane():
    key = jax.random.PRNGKey(5)
    xy = jax.random.uniform(key, (256, 2), minval=-2, maxval=2)
    pts = jnp.concatenate([xy, jnp.zeros((256, 1))], axis=1)
    mask = jnp.ones((256,), dtype=bool)
    normals, curvature, _ = ops.estimate_normals(pts, mask, k=16,
                                                 viewpoint=jnp.array([0.0, 0.0, 5.0]))
    nz = np.asarray(normals)[:, 2]
    assert (nz > 0.99).all()  # oriented toward viewpoint above the plane
    assert float(jnp.max(curvature)) < 1e-3


def test_normals_curvature_on_corner():
    # Points on two perpendicular planes near the fold have high curvature
    key = jax.random.PRNGKey(6)
    a = jax.random.uniform(key, (128, 2), minval=0, maxval=1)
    plane1 = jnp.stack([a[:, 0], a[:, 1], jnp.zeros(128)], axis=1)
    plane2 = jnp.stack([a[:, 0], jnp.zeros(128), a[:, 1]], axis=1)
    pts = jnp.concatenate([plane1, plane2])
    mask = jnp.ones((256,), dtype=bool)
    _, curvature, _ = ops.estimate_normals(pts, mask, k=24)
    assert float(jnp.max(curvature)) > 0.01


# ---------------------------- quantile --------------------------------------

def test_masked_quantile():
    vals = jnp.asarray(np.arange(100, dtype=np.float32))
    mask = jnp.arange(100) < 50  # valid: 0..49
    q = ops.masked_quantile(vals, mask, 0.5)
    assert float(q) == 24.0  # ceil(0.5*50)-1 = 24
    assert float(ops.masked_quantile(vals, mask, 1.0)) == 49.0
    assert float(ops.masked_median(vals, mask)) == 24.0
    assert float(ops.masked_mean(vals, mask)) == np.arange(50).mean()


def test_radius_normals_match_knn_normals():
    """Gather-free radius normals must agree with kNN-PCA normals on a
    uniformly sampled plane scene."""
    import jax.numpy as jnp
    from aicp_mapping_tpu.ops.normals import estimate_normals, radius_normals
    from aicp_mapping_tpu.tools.synthetic import room_cloud
    from aicp_mapping_tpu.cloud import Cloud
    from aicp_mapping_tpu.ops.voxel import voxel_downsample

    pts = room_cloud(n=6000, seed=3, noise=0.005)
    c = Cloud.from_numpy(pts, capacity=8192)
    dp, dm = voxel_downsample(c.points, c.mask, 0.08, 4096)
    nk, ck, _ = estimate_normals(dp, dm, k=30)
    nr, cr, cnt = radius_normals(dp, dm, radius=0.4)
    m = np.asarray(dm)
    # normals agree up to sign for the vast majority of points
    dots = np.abs(np.sum(np.asarray(nk) * np.asarray(nr), axis=-1))[m]
    assert (dots > 0.95).mean() > 0.9, (dots > 0.95).mean()
    # neighborhoods are populated
    assert float(np.asarray(cnt)[m].mean()) > 5


def test_masked_quantile_hist_matches_exact():
    import jax.numpy as jnp
    from aicp_mapping_tpu.ops.quantile import (masked_quantile,
                                               masked_quantile_hist)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.exponential(2.0, 4096).astype(np.float32))
    m = jnp.asarray(rng.random(4096) > 0.2)
    for q in (0.25, 0.5, 0.7, 0.9):
        exact = float(masked_quantile(v, m, jnp.float32(q)))
        approx = float(masked_quantile_hist(v, m, jnp.float32(q)))
        # within one fine-bin width of the exact quantile, and conservative
        # (approx >= exact so the trim keeps at least the requested fraction)
        assert approx >= exact - 1e-6, (q, exact, approx)
        assert approx - exact < float(v.max()) / (128 * 128) + 1e-4, (q, exact, approx)


def test_nn_payload_matches_argmin():
    from aicp_mapping_tpu.ops.knn import (nn_argmin_xla, nn_payload_pallas,
                                          nn_payload_xla)
    rng = np.random.default_rng(3)
    M, N = 512, 1024
    q = jnp.asarray(rng.uniform(-10, 10, (M, 3)).astype(np.float32))
    r = jnp.asarray(rng.uniform(-10, 10, (N, 3)).astype(np.float32))
    qm = jnp.asarray(rng.uniform(size=M) > 0.1)
    rm = jnp.asarray(rng.uniform(size=N) > 0.1)
    payload = jnp.concatenate(
        [r, jnp.asarray(rng.normal(size=(N, 5)).astype(np.float32))], axis=1)

    d_ref, idx = nn_argmin_xla(q, qm, r, rm)
    d_x, p_x = nn_payload_xla(q, qm, r, rm, payload)
    np.testing.assert_allclose(np.asarray(d_x), np.asarray(d_ref), rtol=1e-6)
    expect = np.where(np.asarray(qm)[:, None],
                      np.asarray(payload)[np.asarray(idx)], 0.0)
    np.testing.assert_allclose(np.asarray(p_x), expect, rtol=1e-6)

    # pallas kernel in interpret mode (functional check; Mosaic-lowering
    # constraints are exercised on the real chip by the verify drive)
    d_p, p_p = nn_payload_pallas(q, qm, r, rm, payload, packed=False,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_p), expect, rtol=1e-5, atol=1e-5)

    # packed-key kernel (default): distances quantized to ~1.3e-4 relative
    # (low 10 mantissa bits carry the column id); payloads still exact
    # selections of the same winners away from sub-quantum ties.
    d_k, p_k = nn_payload_pallas(q, qm, r, rm, payload, packed=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_ref),
                               rtol=3e-4, atol=1e-5)
    same_row = np.all(np.asarray(p_k) == expect, axis=1)
    assert np.mean(same_row) > 0.99, np.mean(same_row)

    # bf16 split-product kernel (the ICP hot-loop default on TPU):
    # ~1e-3 m^2 absolute distance wobble at these coordinate scales,
    # payloads exact f32 selections of (almost always) the same winners
    from aicp_mapping_tpu.ops.knn import nn_payload_pallas_split

    d_s, p_s = nn_payload_pallas_split(q, qm, r, rm, payload, interpret=True)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_ref),
                               rtol=3e-4, atol=2e-3)
    same_row = np.all(np.asarray(p_s) == expect, axis=1)
    assert np.mean(same_row) > 0.99, np.mean(same_row)


def test_radius_moments_pallas_matches_xla():
    from aicp_mapping_tpu.ops.normals import _radius_moments_pallas
    rng = np.random.default_rng(5)
    N = 1024
    pts = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=N) > 0.1)
    radius = 0.8
    M = np.asarray(_radius_moments_pallas(pts, mask, radius, interpret=True))
    # reference: dense numpy
    p = np.asarray(pts)
    m = np.asarray(mask)
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    w = (d2 <= radius * radius) & m[None, :]
    F = np.concatenate([p, p**2, (p[:, [0, 0, 1]] * p[:, [1, 2, 2]]),
                        np.ones((N, 1), np.float32)], axis=1) * m[:, None]
    expect = w.astype(np.float32) @ F
    np.testing.assert_allclose(M, expect, rtol=1e-4, atol=1e-3)


def test_radius_moments_banded_full_coverage():
    """Banded moments with full band coverage vs exhaustive (interpret).

    The banded path runs the bf16-split kernel whose radius test carries
    ~1e-3 m^2 boundary wobble (an exact kernel for a radius perturbed by
    ~1 mm), so the contract is neighbor-set agreement up to shell flips:
    near-identical counts everywhere and exact moments wherever the
    neighbor set matches."""
    from aicp_mapping_tpu.ops.normals import (_radius_moments_banded,
                                              _radius_moments_pallas)
    rng = np.random.default_rng(7)
    N = 1024
    pts = jnp.asarray(rng.uniform(0, 8, (N, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=N) > 0.1)
    full = np.asarray(_radius_moments_pallas(pts, mask, 0.5, tm=128, tn=128,
                                             interpret=True))
    band = np.asarray(_radius_moments_banded(pts, mask, 0.5, cell_size=2.0,
                                             band=N // 128, tm=128, tn=128,
                                             interpret=True))
    cnt_diff = np.abs(band[:, 9] - full[:, 9])
    assert (cnt_diff <= 2).mean() > 0.99, cnt_diff.max()
    same = cnt_diff == 0
    assert same.mean() > 0.9, same.mean()
    np.testing.assert_allclose(band[same], full[same], rtol=1e-4, atol=1e-3)


def test_split3_bf16_exact():
    """The 3-way bf16 split must reconstruct f32 exactly (bit-masked
    truncation: 8+8+8 mantissa bits cover f32's 24) — the foundation of the
    fast banded-moments kernel's accuracy claim."""
    from aicp_mapping_tpu.ops.normals import _split3_bf16

    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.uniform(-80, 80, (4096,)) ** 3 / 600
                     ).astype(np.float32))
    h, m, l = _split3_bf16(x)
    back = (h.astype(jnp.float32) + m.astype(jnp.float32)
            + l.astype(jnp.float32))
    err = np.abs(np.asarray(back) - np.asarray(x))
    # hi and mid are exactly representable; lo carries one rounding
    assert err.max() <= np.abs(np.asarray(x)).max() * 2 ** -22, err.max()


def test_radius_moments_banded_partial_band_quality():
    """Narrow band still recovers nearly all neighbors on a smooth scene."""
    from aicp_mapping_tpu.ops.normals import (_radius_moments_banded,
                                              _radius_moments_pallas)
    from aicp_mapping_tpu.tools.synthetic import room_cloud
    pts_np = room_cloud(n=2200, size=10.0, seed=1, noise=0.005)[:2048]
    pts = jnp.asarray(pts_np)
    mask = jnp.ones((len(pts_np),), bool)
    full = np.asarray(_radius_moments_pallas(pts, mask, 0.4, tm=128, tn=128,
                                             interpret=True))
    band = np.asarray(_radius_moments_banded(pts, mask, 0.4, cell_size=2.0,
                                             band=6, tm=128, tn=128,
                                             interpret=True))
    # counts: banded finds >= 90% of exhaustive neighbors for >= 90% of pts
    frac = band[:, 9] / np.maximum(full[:, 9], 1.0)
    assert np.quantile(frac, 0.1) > 0.9, np.quantile(frac, [0.05, 0.1, 0.5])


def test_voxel_downsample_centroid_precision_at_range():
    """The prefix-sum-difference voxel reduction must hold centroid accuracy
    at lidar ranges: summing voxel-corner offsets keeps errors ~0.1 mm,
    where absolute-coordinate prefix sums would lose ~0.5 m to f32
    cancellation at 64k points x 60 m coordinates."""
    from collections import defaultdict

    from aicp_mapping_tpu.ops.voxel import voxel_downsample, voxel_keys

    rng = np.random.default_rng(7)
    n, cap = 20000, 8192
    pts = rng.uniform(-38.0, 40.0, (n, 3)).astype(np.float32)
    m = np.ones(n, bool)
    m[int(n * 0.9):] = False
    op, om = voxel_downsample(jnp.asarray(pts), jnp.asarray(m), 0.08, cap)
    op, om = np.asarray(op), np.asarray(om)

    keys = np.asarray(voxel_keys(jnp.asarray(pts), jnp.asarray(m), 0.08))
    acc = defaultdict(lambda: [np.zeros(3), 0])
    for p, k, mm in zip(pts, keys, m):
        if mm:
            a = acc[k]
            a[0] += p.astype(np.float64)
            a[1] += 1
    ref = np.array([a[0] / a[1] for a in acc.values()])
    assert om.sum() == min(len(ref), cap)
    errs = np.array([np.linalg.norm(ref - gp, axis=1).min() for gp in op[om]])
    assert errs.max() < 5e-4, errs.max()
