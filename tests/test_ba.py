"""Plane-landmark bundle adjustment (parallel/ba.py) tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aicp_mapping_tpu.geometry import se3
from aicp_mapping_tpu.parallel.ba import (PlaneBA, build_plane_ba,
                                          extract_planes, optimize_plane_ba,
                                          optimize_plane_ba_sharded,
                                          pad_observations, plane_residual,
                                          transform_plane)


def _random_problem(seed=0, K=5, L=12, pose_noise=0.05, lm_noise=0.02):
    """Noiseless observations from ground-truth planes/poses; initial state
    perturbed (pose 0 kept exact — it is the gauge anchor)."""
    rng = np.random.default_rng(seed)
    n = rng.normal(size=(L, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    d = rng.uniform(-5, 5, L).astype(np.float32)
    lms_gt = np.concatenate([n, d[:, None]], axis=1)

    poses_gt = []
    for k in range(K):
        xi = jnp.asarray(np.r_[rng.uniform(-1, 1, 3) * 2.0,
                               rng.uniform(-1, 1, 3) * 0.3], jnp.float32)
        poses_gt.append(np.asarray(se3.se3_exp(xi), np.float32))
    poses_gt = np.stack(poses_gt)

    obs_k, obs_l, obs_plane = [], [], []
    for k in range(K):
        T = jnp.asarray(poses_gt[k])
        R, t = poses_gt[k][:3, :3], poses_gt[k][:3, 3]
        for j in range(L):
            m = R.T @ lms_gt[j, :3]
            e = lms_gt[j, 3] - lms_gt[j, :3] @ t
            obs_k.append(k)
            obs_l.append(j)
            obs_plane.append(np.r_[m, e].astype(np.float32))

    init_poses = poses_gt.copy()
    for k in range(1, K):
        xi = jnp.asarray(np.r_[rng.normal(0, pose_noise, 3),
                               rng.normal(0, pose_noise, 3)], jnp.float32)
        init_poses[k] = np.asarray(se3.se3_exp(xi)) @ init_poses[k]
    init_lms = lms_gt + rng.normal(0, lm_noise, lms_gt.shape).astype(np.float32)
    init_lms[:, :3] /= np.linalg.norm(init_lms[:, :3], axis=1, keepdims=True)

    prob = PlaneBA(
        poses=jnp.asarray(init_poses),
        landmarks=jnp.asarray(init_lms),
        obs_k=jnp.asarray(obs_k, jnp.int32),
        obs_l=jnp.asarray(obs_l, jnp.int32),
        obs_plane=jnp.asarray(np.stack(obs_plane)),
        obs_w=jnp.ones((len(obs_k),), jnp.float32),
        obs_mask=jnp.ones((len(obs_k),), bool),
    )
    return prob, poses_gt, lms_gt


def test_plane_residual_zero_at_truth():
    prob, poses_gt, lms_gt = _random_problem()
    r = plane_residual(jnp.zeros(6), jnp.zeros(4),
                       jnp.asarray(poses_gt[2]), jnp.asarray(lms_gt[3]),
                       prob.obs_plane[2 * lms_gt.shape[0] + 3])
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)


def test_transform_plane_roundtrip():
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.normal(0, 0.5, 6), jnp.float32)
    T = se3.se3_exp(xi)
    n = rng.normal(size=3).astype(np.float32)
    n /= np.linalg.norm(n)
    body = jnp.asarray(np.r_[n, 1.7], jnp.float32)
    world = transform_plane(T, body)
    # a body point on the plane maps onto the world plane
    p_b = body[3] * body[:3]
    p_w = se3.transform_points(T, p_b[None, :])[0]
    np.testing.assert_allclose(float(jnp.dot(world[:3], p_w)),
                               float(world[3]), rtol=1e-5, atol=1e-5)


def test_ba_recovers_perturbed_poses():
    prob, poses_gt, lms_gt = _random_problem(seed=3)
    poses, lms, chi2 = optimize_plane_ba(prob, gn_iters=8)
    poses = np.asarray(poses)
    assert float(chi2) < 1e-8
    for k in range(poses_gt.shape[0]):
        err = np.linalg.inv(poses_gt[k]) @ poses[k]
        t_err = np.linalg.norm(err[:3, 3])
        r_err = np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1))
        assert t_err < 1e-3, (k, t_err)
        assert r_err < 1e-3, (k, r_err)


def test_ba_masked_pad_is_noop():
    prob, _, _ = _random_problem(seed=4)
    padded = pad_observations(prob, 16)
    assert padded.obs_k.shape[0] % 16 == 0
    p0, l0, c0 = optimize_plane_ba(prob, gn_iters=4)
    p1, l1, c1 = optimize_plane_ba(padded, gn_iters=4)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(c0), float(c1), rtol=1e-5, atol=1e-9)


def test_ba_sharded_matches_single_device():
    from aicp_mapping_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    mesh = make_mesh(axis="graph")
    n_dev = mesh.shape["graph"]
    prob, _, _ = _random_problem(seed=5)
    prob = pad_observations(prob, n_dev)
    p0, l0, c0 = optimize_plane_ba(prob, gn_iters=5)
    p1, l1, c1 = optimize_plane_ba_sharded(prob, mesh, axis="graph",
                                           gn_iters=5)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-4, atol=1e-5)


def test_extract_planes_room():
    from aicp_mapping_tpu.ops.normals import radius_normals
    from aicp_mapping_tpu.tools.synthetic import room_cloud

    pts_np = room_cloud(n=4000, size=8.0, seed=0, noise=0.003)
    pts = jnp.asarray(pts_np)
    mask = jnp.ones((pts.shape[0],), bool)
    normals, curv, _ = radius_normals(pts, mask, 0.5)
    planes, w, valid = extract_planes(pts, mask, normals, curv,
                                      max_planes=12, min_points=80)
    planes, w, valid = (np.asarray(planes), np.asarray(w), np.asarray(valid))
    assert valid.sum() >= 4            # room has >= 4 big surfaces
    # each valid plane explains its own points: |n| == 1, |d| <= world diag
    for j in np.flatnonzero(valid):
        np.testing.assert_allclose(np.linalg.norm(planes[j, :3]), 1.0,
                                   rtol=1e-4)
        assert abs(planes[j, 3]) < 20.0


def test_plane_ba_improves_room_drift():
    """Joint plane BA must STRICTLY improve a trajectory whose error lies
    in the plane-observable subspace. A room world (floor + ceiling +
    walls: full orientation diversity) is traversed by keyframes whose
    poses carry accumulated z/pitch drift — exactly what cross-keyframe
    plane landmarks observe and odometry cannot. BA runs the full shipped
    path (extraction -> association -> chi^2 consensus gate -> Huber ->
    joint solve with the odometry edges, which encode the DRIFTED chain
    and must be overpowered by the planes)."""
    from aicp_mapping_tpu.ops.normals import radius_normals
    from aicp_mapping_tpu.parallel.posegraph import make_odometry_edges
    from aicp_mapping_tpu.tools.synthetic import room_cloud

    world = room_cloud(n=6000, size=10.0, seed=4, noise=0.004)
    K = 6
    rng = np.random.default_rng(11)
    gt = []
    T = np.eye(4, dtype=np.float64)
    for k in range(K):
        gt.append(T.copy())
        T[0, 3] += 1.0
    gt = np.stack(gt)
    # accumulated z + pitch drift (plane-observable directions)
    pert = []
    z_err, pitch_err = 0.0, 0.0
    for k in range(K):
        z_err += rng.normal(0.0, 0.08)
        pitch_err += np.deg2rad(rng.normal(0.0, 1.5))
        c, s = np.cos(pitch_err), np.sin(pitch_err)
        D = np.eye(4)
        D[0, 0] = c
        D[0, 2] = s
        D[2, 0] = -s
        D[2, 2] = c
        D[2, 3] = z_err
        pert.append(gt[k] @ D)
    pert = np.stack(pert).astype(np.float32)

    planes_list, w_list, v_list = [], [], []
    for k in range(K):
        Tb = jnp.asarray(np.linalg.inv(gt[k]).astype(np.float32))
        body = se3.transform_points(Tb, jnp.asarray(world))
        m = jnp.ones((body.shape[0],), bool)
        normals, curv, _ = radius_normals(body, m, 0.5)
        pl, w, v = extract_planes(body, m, normals, curv, max_planes=12,
                                  min_points=80)
        planes_list.append(np.asarray(pl))
        w_list.append(np.asarray(w))
        v_list.append(np.asarray(v))

    prob = build_plane_ba(pert, np.stack(planes_list), np.stack(w_list),
                          np.stack(v_list), reject_normal_deg=8.0,
                          reject_offset_m=0.3, min_obs_per_landmark=2)
    edges, Z, ew = make_odometry_edges(jnp.asarray(pert))

    def aligned_ate(est):
        a = np.asarray(est)[:, :3, 3]
        b = gt[:, :3, 3]
        ca, cb = a.mean(0), b.mean(0)
        H = (a - ca).T @ (b - cb)
        U, S, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(Vt.T @ U.T))
        R = Vt.T @ np.diag([1, 1, d]) @ U.T
        t = cb - R @ ca
        return float(np.sqrt(np.mean(np.sum(
            ((a @ R.T + t) - b) ** 2, axis=1))))

    ate_before = aligned_ate(pert)
    poses, lms, chi2 = optimize_plane_ba(
        prob, gn_iters=6, pose_damping=1.0,
        robust_sigma_n=0.09, robust_sigma_e=0.10,
        graph_edges=edges, graph_Z=Z, graph_w=ew,
        graph_mask=jnp.ones((edges.shape[0],), bool),
        edge_robust_delta=10.0)
    ate_after = aligned_ate(poses)
    assert ate_before > 0.03, ate_before   # drift is real
    assert ate_after < 0.5 * ate_before, (ate_before, ate_after)


def test_build_plane_ba_associates_across_keyframes():
    from aicp_mapping_tpu.ops.normals import radius_normals
    from aicp_mapping_tpu.tools.synthetic import room_cloud

    world = room_cloud(n=4000, size=8.0, seed=1, noise=0.003)
    # two keyframes: identity and a small known motion
    xi = jnp.asarray([0.03, 0.0, 0.1, 0.15, -0.1, 0.02], jnp.float32)
    T1 = se3.se3_exp(xi)
    kf_poses = np.stack([np.eye(4, dtype=np.float32), np.asarray(T1)])
    planes_list, w_list, v_list = [], [], []
    for T in kf_poses:
        Tb = jnp.asarray(np.linalg.inv(T).astype(np.float32))
        body = se3.transform_points(Tb, jnp.asarray(world))
        m = jnp.ones((body.shape[0],), bool)
        normals, curv, _ = radius_normals(body, m, 0.5)
        pl, w, v = extract_planes(body, m, normals, curv, max_planes=12,
                                  min_points=80)
        planes_list.append(pl)
        w_list.append(w)
        v_list.append(v)

    prob = build_plane_ba(kf_poses, np.stack(planes_list), np.stack(w_list),
                          np.stack(v_list))
    # both keyframes observe mostly the same surfaces -> shared landmarks
    assert prob.n_landmarks < int(np.asarray(v_list[0]).sum()
                                  + np.asarray(v_list[1]).sum())
    # BA on the (already consistent) problem must not blow up the poses
    poses, lms, chi2 = optimize_plane_ba(prob, gn_iters=4)
    d = np.asarray(poses[1]) @ np.linalg.inv(kf_poses[1])
    assert np.linalg.norm(d[:3, 3]) < 0.05
