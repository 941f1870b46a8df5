"""SE(3) / SO(3) math for the TPU-native AICP engine.

All functions are pure jax.numpy, shape-static, and vmappable. Transforms are
represented as 4x4 homogeneous matrices (float32 by default); rotations also as
unit quaternions in (w, x, y, z) order.

Semantics mirrored from the reference implementation (not ported code):
  - quat<->euler conventions: aicp_core/src/utils/common.cpp:70-105
  - Matrix4f -> Isometry3d: aicp_core/src/utils/common.cpp:4-23
  - gravity re-pinning (roll/pitch replacement):
    aicp_core/src/registration/aligned_cloud.cpp:31-52
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd's method: computes all four candidate quaternions and
    selects the numerically best by largest pivot (needed under jit).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by 4*q_k^2 (k = w, x, y, z)
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_to_euler(q: jax.Array):
    """Quaternion -> (roll, pitch, yaw).

    Same formulas as the reference `quat_to_euler` (common.cpp:70-78).
    """
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
    pitch = jnp.arcsin(jnp.clip(2 * (q0 * q2 - q3 * q1), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
    return roll, pitch, yaw


def euler_to_quat(roll, pitch, yaw) -> jax.Array:
    """(roll, pitch, yaw) -> quaternion; matches common.cpp:81-105."""
    roll, pitch, yaw = jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw)
    sy, cy = jnp.sin(yaw * 0.5), jnp.cos(yaw * 0.5)
    sp, cp = jnp.sin(pitch * 0.5), jnp.cos(pitch * 0.5)
    sr, cr = jnp.sin(roll * 0.5), jnp.cos(roll * 0.5)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return quat_normalize(jnp.stack([w, x, y, z], axis=-1))


# ---------------------------------------------------------------------------
# Homogeneous 4x4 transforms
# ---------------------------------------------------------------------------

def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def make_transform(rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(rotation.shape[:-2], translation.shape[:-1])
    rotation = jnp.broadcast_to(rotation, batch + (3, 3))
    translation = jnp.broadcast_to(translation, batch + (3,))
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rotation.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_quat_trans(q: jax.Array, t: jax.Array) -> jax.Array:
    return make_transform(quat_to_matrix(q), t)


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def inverse(T: jax.Array) -> jax.Array:
    """Rigid-transform inverse via R^T (no general 4x4 inversion)."""
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return A @ B


def transform_points(T: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (4, 4) transform to (..., 3) points."""
    return points @ rotation(T).T + translation(T)


def rotate_vectors(T: jax.Array, vecs: jax.Array) -> jax.Array:
    return vecs @ rotation(T).T


# ---------------------------------------------------------------------------
# so(3) / se(3) exp & log maps
# ---------------------------------------------------------------------------

def skew(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) -> (..., 3, 3). Taylor-safe near zero."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = skew(w)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A * K + B * (K @ K)


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3) rotation vector; Taylor-safe."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    vec = jnp.stack(
        [w_skew[..., 2, 1], w_skew[..., 0, 2], w_skew[..., 1, 0]], axis=-1
    )
    sin_theta = jnp.sin(theta)
    # theta / sin(theta), Taylor near 0; near pi fall back to quaternion route
    small = theta[..., None] < 1e-4
    scale = jnp.where(
        small,
        1.0 + theta[..., None] ** 2 / 6.0,
        theta[..., None] / jnp.where(jnp.abs(sin_theta[..., None]) < _EPS, 1.0, sin_theta[..., None]),
    )
    w = vec * scale
    # Near theta = pi the antisymmetric part vanishes; use quaternion formula.
    near_pi = theta[..., None] > 3.0
    q = matrix_to_quat(R)
    qv = q[..., 1:4]
    qn = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    w_pi = qv / jnp.maximum(qn, _EPS) * theta[..., None]
    return jnp.where(near_pi, w_pi, w)


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) twist (..., 6) [v, w] -> (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = skew(w)
    small = theta2 < 1e-8
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + B * K + C * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_transform(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> twist (..., 6) [v, w]."""
    R = rotation(T)
    t = translation(T)
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = skew(w)
    # Small-angle cutoff sized for f32: 1 - cos(theta) underflows to 0 for
    # theta^2 below ~1.2e-7 (making B = 0 and the closed form inf/NaN on a
    # near-identity pose with a tiny real rotation), so switch to the
    # Taylor branch well above that; at theta = 1e-3 the Taylor error is
    # O(theta^4) ~ 1e-12.
    small = theta2 < 1e-6
    # V^{-1} = I - K/2 + (1/theta^2)(1 - A/(2B)) K^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * jnp.maximum(B, _EPS)))
        / jnp.maximum(theta2, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * (K @ K)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def adjoint(T: jax.Array) -> jax.Array:
    """Adjoint of SE(3): (..., 6, 6) acting on [v, w] twists."""
    R = rotation(T)
    t = translation(T)
    tR = skew(t) @ R
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# AICP-specific helpers
# ---------------------------------------------------------------------------

def repin_roll_pitch(corrected: jax.Array, odom: jax.Array) -> jax.Array:
    """Replace roll/pitch of `corrected` with odometry's, keeping yaw and
    translation — gravity-consistency re-pinning
    (reference: aligned_cloud.cpp:31-52 `removePitchRollCorrection`).
    """
    r_odom, p_odom, _ = quat_to_euler(matrix_to_quat(rotation(odom)))
    _, _, y_corr = quat_to_euler(matrix_to_quat(rotation(corrected)))
    q_fixed = euler_to_quat(r_odom, p_odom, y_corr)
    return make_transform(quat_to_matrix(q_fixed), translation(corrected))


def rotation_angle_deg(T: jax.Array) -> jax.Array:
    """Geodesic rotation angle of a transform, degrees."""
    w = so3_log(rotation(T))
    return jnp.linalg.norm(w, axis=-1) * (180.0 / jnp.pi)
