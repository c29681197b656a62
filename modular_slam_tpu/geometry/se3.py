"""SE(3) / quaternion math as pure jnp functions.

Conventions (matching the reference, /root/reference/src/lib/modular_slam/
projection.cpp:13-28):

- A sensor/keyframe pose is **camera-to-world**: ``p_world = q * p_cam + t``.
- ``pose_apply_inverse(pose, p_world)`` is the reference's
  ``toCameraCoordinates``: ``q^{-1} * (p_world - t)``.
- Quaternions are stored as ``[w, x, y, z]`` float arrays and kept
  normalized; all ops broadcast over leading batch dimensions.

Everything here is differentiable and vmappable; poses are NamedTuple
pytrees so they flow through jit/scan unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

Array = jnp.ndarray

_EPS = 1e-8


class Pose(NamedTuple):
    """Camera-to-world rigid transform. q: [..., 4] wxyz, t: [..., 3]."""

    q: Array
    t: Array


def identity_pose(batch_shape=(), dtype=jnp.float32) -> Pose:
    q = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype), (*batch_shape, 4)
    )
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return Pose(q=q, t=t)


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------


def quat_normalize(q: Array) -> Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so log/compare are stable
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_multiply(a: Array, b: Array) -> Array:
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


def quat_conjugate(q: Array) -> Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q: Array) -> Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quat(m: Array) -> Array:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (wxyz).

    Branch-free Shepperd-style construction: compute all four candidate
    quaternions and select the numerically best by largest diagonal term
    (jnp.where-based, safe under jit/vmap).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate 0: trace-dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack(
        [0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0],
        axis=-1,
    )
    # candidate 1: m00-dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack(
        [(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1],
        axis=-1,
    )
    # candidate 2: m11-dominant
    s2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack(
        [(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2],
        axis=-1,
    )
    # candidate 3: m22-dominant
    s3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack(
        [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3],
        axis=-1,
    )

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


def quat_from_axis_angle(axis_angle: Array) -> Array:
    """so(3) vector [..., 3] -> quaternion.

    Differentiable at exactly 0 (double-where pattern: the norm is never
    evaluated with a zero argument on the taken path, so jacfwd/jacrev at
    the identity produce the correct finite Jacobians — required by the
    pose-graph optimizer, which linearizes at xi = 0)."""
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = theta2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))  # safe sqrt operand
    half = 0.5 * theta
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * axis_angle], axis=-1))


so3_exp = quat_from_axis_angle


def so3_log(q: Array) -> Array:
    """Quaternion -> so(3) vector (axis * angle); differentiable at the
    identity (double-where on the vector norm)."""
    q = quat_normalize(q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn2 < 1e-12
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    theta = 2.0 * jnp.arctan2(vn, w)
    # small: theta/vn -> 2/w * (1 - vn^2/(3w^2) + ...) ~= 2/w
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / vn)
    return k * v


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def _skew(v: Array) -> Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(*v.shape[:-1], 3, 3)


def se3_exp(xi: Array) -> Pose:
    """se(3) vector [..., 6] (rho, phi) -> Pose.  V-matrix translation.
    Differentiable at xi = 0 (double-where on all norm-dependent terms)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    th2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = th2 < 1e-10
    theta = jnp.sqrt(jnp.where(small, 1.0, th2))
    q = quat_from_axis_angle(phi)

    a = jnp.where(small, 0.5 - th2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, th2))
    b = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0, th2 * theta))
    K = _skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + a[..., None] * K + b[..., None] * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return Pose(q=q, t=t)


def se3_log(pose: Pose) -> Array:
    """Pose -> se(3) vector; differentiable at the identity."""
    phi = so3_log(pose.q)
    th2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = th2 < 1e-10
    theta = jnp.sqrt(jnp.where(small, 1.0, th2))
    K = _skew(phi)
    # V^{-1} = I - K/2 + c * K^2
    half = theta / 2.0
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half)))
        / jnp.where(small, 1.0, th2),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    Vinv = eye - 0.5 * K + cot_term[..., None] * (K @ K)
    rho = jnp.einsum("...ij,...j->...i", Vinv, pose.t)
    return jnp.concatenate([rho, phi], axis=-1)


def pose_compose(a: Pose, b: Pose) -> Pose:
    """a then b applied to camera points: result maps p -> a(b(p))."""
    return Pose(
        q=quat_normalize(quat_multiply(a.q, b.q)),
        t=quat_rotate(a.q, b.t) + a.t,
    )


def pose_inverse(p: Pose) -> Pose:
    qi = quat_conjugate(p.q)
    return Pose(q=qi, t=-quat_rotate(qi, p.t))


def pose_apply(p: Pose, pts: Array) -> Array:
    """camera -> world (reference toGlobalCoordinates, projection.cpp:51-54).

    Broadcasts: a single pose (q [4], t [3]) applies to pts [N, 3]; batched
    poses [..., 4]/[..., 3] apply elementwise to pts [..., 3].
    """
    return quat_rotate(p.q, pts) + p.t


def pose_apply_inverse(p: Pose, pts: Array) -> Array:
    """world -> camera (reference toCameraCoordinates, projection.cpp:13-17)."""
    return quat_rotate(quat_conjugate(p.q), pts - p.t)


def pose_retract(p: Pose, xi: Array) -> Pose:
    """Right-multiplicative retraction used by optimizers: p * exp(xi)."""
    return pose_compose(p, se3_exp(xi))


def pose_to_matrix(p: Pose) -> Array:
    """Pose -> homogeneous [..., 4, 4] camera-to-world matrix."""
    R = quat_to_matrix(p.q)
    top = jnp.concatenate([R, p.t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.t.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
