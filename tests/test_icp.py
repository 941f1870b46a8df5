import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aicp_mapping_tpu.cloud import Cloud
from aicp_mapping_tpu.geometry import se3
from aicp_mapping_tpu.ops import estimate_normals
from aicp_mapping_tpu.registration import (
    ICPConfig,
    clamp_trim_ratio,
    degeneracy_predictions,
    point_to_plane_icp,
)
from aicp_mapping_tpu.registration.monitor import hausdorff_distance
from aicp_mapping_tpu.tools.synthetic import corridor_cloud, cube_cloud, room_cloud


def _prep_reference(pts_np, cap):
    ref = Cloud.from_numpy(pts_np, capacity=cap)
    normals, _, _ = estimate_normals(ref.points, ref.mask, k=12)
    return ref, normals


def _perturb(seed, trans_sigma=0.1, rot_sigma_deg=5.0):
    rng = np.random.default_rng(seed)
    t = rng.normal(0, trans_sigma, 3).astype(np.float32)
    w = np.deg2rad(rng.normal(0, rot_sigma_deg, 3)).astype(np.float32)
    return se3.make_transform(se3.so3_exp(jnp.asarray(w)), jnp.asarray(t))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cube_self_registration_recovers_identity(seed):
    """Reference validation harness semantics: register a cube against a
    perturbed copy of itself; ground truth correction = inverse perturbation
    (registration_main.cpp:331-343, run_registration_validation.sh)."""
    pts = cube_cloud(n_per_face=400, size=4.0, seed=0)
    ref, normals = _prep_reference(pts, 2560)
    T_pert = _perturb(seed)
    reading = Cloud(se3.transform_points(T_pert, ref.points), ref.mask)

    result = point_to_plane_icp(
        reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.70),
    )
    # correction should equal inverse perturbation
    err = se3.compose(result.T, T_pert)
    t_err = float(jnp.linalg.norm(se3.translation(err)))
    r_err = float(se3.rotation_angle_deg(err))
    assert t_err < 0.02, t_err
    assert r_err < 0.5, r_err


def test_room_registration_with_noise_and_partial_overlap():
    pts = room_cloud(n=4800, seed=1, noise=0.01)
    ref, normals = _prep_reference(pts, 4800)
    T_pert = _perturb(7, trans_sigma=0.15, rot_sigma_deg=4.0)
    # Partial overlap: drop 30% of reading points
    reading_np = np.asarray(ref.points)[: int(4800 * 0.7)]
    reading = Cloud.from_numpy(reading_np, capacity=4800)
    reading = Cloud(se3.transform_points(T_pert, reading.points), reading.mask)

    result = point_to_plane_icp(
        reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.60),
    )
    err = se3.compose(result.T, T_pert)
    assert float(jnp.linalg.norm(se3.translation(err))) < 0.05
    assert float(se3.rotation_angle_deg(err)) < 1.0


def test_icp_converges_early():
    """With an identity perturbation the differential checker should stop
    well before maxIterationCount=20 (icp_autotuned.yaml:46-52)."""
    pts = cube_cloud(n_per_face=200, seed=0)
    ref, normals = _prep_reference(pts, 1280)
    result = point_to_plane_icp(
        ref.points, ref.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.70),
    )
    assert int(result.n_iterations) <= 6
    assert float(result.inlier_rms) < 1e-3


def test_clamp_trim_ratio():
    # app.cpp:198-202 clamp to [0.25, 0.70]
    assert float(clamp_trim_ratio(jnp.float32(10.0))) == pytest.approx(0.25)
    assert float(clamp_trim_ratio(jnp.float32(50.0))) == pytest.approx(0.50)
    assert float(clamp_trim_ratio(jnp.float32(95.0))) == pytest.approx(0.70)


def test_degeneracy_detects_corridor():
    """A corridor (unconstrained x) must have much lower degeneracy value
    than a room (fully constrained) — filteringUtils.cpp:580-617 semantics."""
    room = room_cloud(n=3000, seed=2)
    corr = corridor_cloud(n=3000, seed=2)

    def hessian_for(pts_np):
        ref, normals = _prep_reference(pts_np, 3072)
        res = point_to_plane_icp(
            ref.points, ref.mask, ref.points, normals, ref.mask,
            se3.identity(), jnp.float32(0.70),
        )
        return res.hessian

    deg_room, icn_room = degeneracy_predictions(hessian_for(room))
    deg_corr, icn_corr = degeneracy_predictions(hessian_for(corr))
    assert float(deg_corr) < 0.3 * float(deg_room)
    assert float(icn_corr) < 0.3 * float(icn_room)


def test_degeneracy_solve_holds_prior_in_corridor():
    """Solution-remapping regression on the scene class it exists for (r4
    verdict next-round #3). Two independently sampled scans of the same
    corridor: along-corridor translation is unobservable, and the plain
    damped solve AMPLIFIES normal-noise gradients along that null
    direction (b_x / lam with lam ~ 1e-3) into a centimeters-scale slide
    that never converges. The degeneracy solve — eigenanalysis in the
    centered, r0-scale-normalized twist basis — suppresses exactly that
    component: the prior holds along x while the transverse perturbation
    is fully recovered, in a fraction of the iterations. (The r4
    origin-basis eigensolve coupled x/y into the suppressed directions on
    real scans and had to be bypassed.)"""
    import dataclasses

    from aicp_mapping_tpu.registration.icp import ICPConfig

    ref_np = corridor_cloud(n=6000, seed=2, noise=0.01)
    read_np = corridor_cloud(n=6000, seed=3, noise=0.01)
    ref = Cloud.from_numpy(ref_np, capacity=6144)
    read = Cloud.from_numpy(read_np, capacity=6144)
    nrm, _, _ = estimate_normals(ref.points, ref.mask, k=12)
    base = ICPConfig(max_iterations=40, min_diff_trans=1e-4,
                     min_diff_rot=1e-5)
    deg = dataclasses.replace(base, degeneracy_threshold=30.0)

    T_p = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.array([0.0, 0.0, 0.02])),
        jnp.array([0.0, 0.06, -0.04])))
    read_p = read.transform(jnp.asarray(T_p.astype(np.float32)))

    res_plain = point_to_plane_icp(read_p.points, read_p.mask, ref.points,
                                   nrm, ref.mask, se3.identity(),
                                   jnp.float32(0.7), base)
    res_deg = point_to_plane_icp(read_p.points, read_p.mask, ref.points,
                                 nrm, ref.mask, se3.identity(),
                                 jnp.float32(0.7), deg)
    E_plain = np.asarray(res_plain.T) @ T_p
    E_deg = np.asarray(res_deg.T) @ T_p
    # plain solve slides along the corridor (measured ~4 cm) and burns the
    # whole iteration budget; the remapped solve holds the prior along x...
    assert abs(E_plain[0, 3]) > 0.02, E_plain[0, 3]
    assert abs(E_deg[0, 3]) < 0.005, E_deg[0, 3]
    assert int(res_deg.n_iterations) < 15 <= int(res_plain.n_iterations)
    # ...while fully recovering the observable transverse perturbation
    assert abs(E_deg[1, 3]) < 0.005 and abs(E_deg[2, 3]) < 0.005, E_deg


def test_hausdorff_distance():
    a = Cloud.from_numpy(np.array([[0, 0, 0], [1, 0, 0]], dtype=np.float32), 4)
    b = Cloud.from_numpy(np.array([[0, 0, 0.5], [1, 0, 0]], dtype=np.float32), 4)
    d = hausdorff_distance(a.points, a.mask, b.points, b.mask)
    assert float(d) == pytest.approx(0.5, abs=1e-5)


def test_point_to_point_recovers_identity():
    """Besl92 point-to-point chain variant (config/icp/ point-to-point
    YAMLs): same recovery property as point-to-plane on the cube."""
    pts = cube_cloud(n_per_face=400, size=4.0, seed=0)
    ref, normals = _prep_reference(pts, 2560)
    T_pert = _perturb(3)
    reading = Cloud(se3.transform_points(T_pert, ref.points), ref.mask)

    result = point_to_plane_icp(
        reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.70),
        ICPConfig(error_metric="point_to_point", max_iterations=40),
    )
    err = se3.compose(result.T, T_pert)
    assert float(jnp.linalg.norm(se3.translation(err))) < 0.03
    assert float(se3.rotation_angle_deg(err)) < 1.0


def _ground_and_walls(seed=0, n_ground=6000, n_wall=600, noise=0.005):
    """Dominant ground plane + two sparse perpendicular facades, with exact
    analytic normals — the outdoor regime where a global trim quantile is
    shadowed by the ground surface."""
    rng = np.random.default_rng(seed)
    g = np.stack([rng.uniform(-10, 10, n_ground),
                  rng.uniform(-10, 10, n_ground),
                  np.zeros(n_ground)], axis=1)
    wx = np.stack([np.full(n_wall, 6.0),
                   rng.uniform(-10, 10, n_wall),
                   rng.uniform(0, 4, n_wall)], axis=1)
    wy = np.stack([rng.uniform(-10, 10, n_wall),
                   np.full(n_wall, -7.0),
                   rng.uniform(0, 4, n_wall)], axis=1)
    pts = np.concatenate([g, wx, wy]).astype(np.float32)
    pts += rng.normal(0, noise, pts.shape).astype(np.float32)
    normals = np.concatenate([
        np.tile([0.0, 0.0, 1.0], (n_ground, 1)),
        np.tile([1.0, 0.0, 0.0], (n_wall, 1)),
        np.tile([0.0, 1.0, 0.0], (n_wall, 1))]).astype(np.float32)
    return pts, normals


def test_normal_space_trim_beats_ground_shadowing():
    """Horizontal prior error on a ground-dominated scene: ground matches
    sit at ~zero distance, facade matches carry the full offset, so a
    GLOBAL trim quantile keeps ground and discards exactly the informative
    correspondences — the solve returns ~identity and the offset passes
    through. Per-normal-bucket trimming keeps the best fraction of each
    orientation class and recovers the offset (the failure observed with
    0.2 m GPS priors on the 64-beam urban drive)."""
    pts, normals = _ground_and_walls()
    cap = 8192
    ref = Cloud.from_numpy(pts, capacity=cap)
    nrm = np.zeros((cap, 3), np.float32)
    nrm[:len(normals)] = normals
    nrm = jnp.asarray(nrm)

    offset = np.array([0.3, -0.25, 0.0], np.float32)
    reading = Cloud.from_numpy(pts + offset, capacity=cap)

    def solve(cfg):
        res = point_to_plane_icp(reading.points, reading.mask,
                                 ref.points, nrm, ref.mask,
                                 se3.identity(), jnp.float32(0.5), cfg)
        return np.asarray(res.T)[:3, 3]

    t_global = solve(ICPConfig())
    t_bucket = solve(ICPConfig(trim_normal_space=True))

    # global trim: shadowed — recovers (almost) none of the offset
    assert np.linalg.norm(t_global + offset) > 0.2, t_global
    # normal-space trim: recovers it
    assert np.linalg.norm(t_bucket + offset) < 0.03, t_bucket


REFERENCE_DATA = "/root/reference/aicp_core/data"


@pytest.mark.skipif(not __import__("os").path.isdir(REFERENCE_DATA),
                    reason="reference dataset not present")
@pytest.mark.parametrize("scan", ["scan_00.csv", "scan_01.csv",
                                  "scan_02.csv"])
def test_reference_real_planar_scans_register(scan):
    """Registration on the reference's REAL shipped sensor scans
    (aicp_core/data/scan_00..02.csv, 2D planar lidar): self-registration
    under a known in-plane perturbation must recover it — the reference's
    own validation pattern (cube self-registration,
    registration_main.cpp:331-343) applied to its real data. Planar scans
    leave z/roll/pitch unconstrained, so the degeneracy-aware solve holds
    those at the prior (the 2D-lidar analog of corridor degeneracy)."""
    import os

    from aicp_mapping_tpu.io.planar import planar_to_cloud, read_planar_csv
    from aicp_mapping_tpu.registration.icp import ICPConfig

    pts2 = read_planar_csv(os.path.join(REFERENCE_DATA, scan))
    assert pts2.shape[0] > 2000  # real scan, not a stub
    pts = planar_to_cloud(pts2)
    ref = Cloud.from_numpy(pts, capacity=4096)

    # known in-plane perturbation: 8 cm translation + 3 deg yaw
    T_pert = se3.make_transform(
        se3.so3_exp(jnp.array([0.0, 0.0, np.deg2rad(3.0)])),
        jnp.array([0.06, -0.05, 0.0]))
    reading = Cloud(se3.transform_points(T_pert, ref.points), ref.mask)

    cfg = ICPConfig(error_metric="point_to_point", degeneracy_threshold=20.0)
    res = point_to_plane_icp(reading.points, reading.mask, ref.points,
                             jnp.zeros_like(ref.points), ref.mask,
                             se3.identity(), jnp.float32(0.85), cfg)
    err = se3.compose(res.T, T_pert)
    t_err = float(jnp.linalg.norm(se3.translation(err)[:2]))
    yaw_err = float(se3.rotation_angle_deg(err))
    assert t_err < 0.02, (scan, t_err)
    assert yaw_err < 0.5, (scan, yaw_err)


def test_coarse_to_fine_matches_plain():
    """Coarse-to-fine ICP (first iterations on a strided reading) must land
    on the same solution as the plain solver — the final full-resolution
    iterations share its fixed point."""
    pts = room_cloud(n=4096, size=8.0, seed=21, noise=0.005)
    ref, normals = _prep_reference(pts, 4096)
    T_pert = _perturb(3, trans_sigma=0.08, rot_sigma_deg=4.0)
    reading = Cloud(se3.transform_points(T_pert, ref.points), ref.mask)

    res_plain = point_to_plane_icp(
        reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.7), ICPConfig())
    res_c2f = point_to_plane_icp(
        reading.points, reading.mask, ref.points, normals, ref.mask,
        se3.identity(), jnp.float32(0.7),
        ICPConfig(coarse_iterations=4, coarse_decimation=4))

    for T in (res_plain.T, res_c2f.T):
        err = se3.compose(T, T_pert)
        assert float(jnp.linalg.norm(se3.translation(err))) < 0.02
        assert float(se3.rotation_angle_deg(err)) < 0.3
    np.testing.assert_allclose(np.asarray(res_c2f.T),
                               np.asarray(res_plain.T), atol=2e-3)
    assert int(res_c2f.n_iterations) > 4  # both phases ran
