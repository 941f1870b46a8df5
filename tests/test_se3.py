import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aicp_mapping_tpu.geometry import se3


def random_transform(key, scale=1.0):
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (3,)) * scale
    t = jax.random.normal(k2, (3,)) * scale
    return se3.make_transform(se3.so3_exp(w), t)


def test_quat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = se3.quat_normalize(jax.random.normal(key, (32, 4)))
    q = q * jnp.where(q[:, 0:1] < 0, -1.0, 1.0)
    R = se3.quat_to_matrix(q)
    q2 = se3.matrix_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_euler_quat_roundtrip():
    rpy = np.array([[0.3, -0.2, 1.4], [0.0, 0.0, 0.0], [1.0, 0.5, -2.0]])
    q = se3.euler_to_quat(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    r, p, y = se3.quat_to_euler(q)
    np.testing.assert_allclose(np.asarray(r), rpy[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(p), rpy[:, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), rpy[:, 2], atol=1e-6)


def test_inverse_compose():
    T = random_transform(jax.random.PRNGKey(1))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    xi = jax.random.normal(key, (16, 6)) * 0.8
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_log_identity():
    np.testing.assert_allclose(np.asarray(se3.se3_log(se3.identity())), np.zeros(6), atol=1e-7)


def test_so3_log_near_pi():
    w = jnp.array([0.0, 0.0, 3.1])
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)


def test_transform_points():
    T = random_transform(jax.random.PRNGKey(3))
    pts = jax.random.normal(jax.random.PRNGKey(4), (10, 3))
    out = se3.transform_points(T, pts)
    expected = (np.asarray(T)[:3, :3] @ np.asarray(pts).T).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_repin_roll_pitch():
    # corrected has roll/pitch/yaw; odometry has different roll/pitch.
    corrected = se3.make_transform(
        se3.quat_to_matrix(se3.euler_to_quat(0.2, 0.1, 0.7)), jnp.array([1.0, 2.0, 3.0])
    )
    odom = se3.make_transform(
        se3.quat_to_matrix(se3.euler_to_quat(0.05, -0.02, 2.0)), jnp.array([0.0, 0.0, 0.0])
    )
    fixed = se3.repin_roll_pitch(corrected, odom)
    r, p, y = se3.quat_to_euler(se3.matrix_to_quat(se3.rotation(fixed)))
    assert abs(float(r) - 0.05) < 1e-5
    assert abs(float(p) + 0.02) < 1e-5
    assert abs(float(y) - 0.7) < 1e-5  # yaw preserved from corrected
    np.testing.assert_allclose(
        np.asarray(se3.translation(fixed)), [1.0, 2.0, 3.0], atol=1e-6
    )


def test_adjoint_consistency():
    # Ad(T) xi == log(T exp(xi) T^-1) for small xi
    T = random_transform(jax.random.PRNGKey(5), scale=0.5)
    xi = jnp.array([0.01, -0.02, 0.005, 0.004, 0.01, -0.008])
    lhs = se3.adjoint(T) @ xi
    rhs = se3.se3_log(T @ se3.se3_exp(xi) @ se3.inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_rotation_angle_deg():
    T = se3.make_transform(se3.so3_exp(jnp.array([0.0, 0.0, np.pi / 6])), jnp.zeros(3))
    assert abs(float(se3.rotation_angle_deg(T)) - 30.0) < 1e-3


def test_repin_numpy_matches_jax():
    """cloud.repin_roll_pitch_np (host-side per-frame pose math) must agree
    with se3.repin_roll_pitch on random transforms."""
    from aicp_mapping_tpu.cloud import repin_roll_pitch_np

    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        corrected = random_transform(key, scale=1.0)
        odom = random_transform(jax.random.PRNGKey(seed + 100), scale=1.0)
        want = np.asarray(se3.repin_roll_pitch(corrected, odom))
        got = repin_roll_pitch_np(np.asarray(corrected), np.asarray(odom))
        np.testing.assert_allclose(got, want, atol=1e-5)
