"""Geometry invariants: quaternion algebra, SE(3) exp/log round-trips,
project∘backproject ≈ id (SURVEY.md §7 step 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modular_slam_tpu.geometry import (
    Pose,
    identity_pose,
    quat_normalize,
    quat_multiply,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    quat_from_axis_angle,
    so3_log,
    se3_exp,
    se3_log,
    pose_compose,
    pose_inverse,
    pose_apply,
    pose_apply_inverse,
    Camera,
    camera_from_config,
    project,
    backproject,
    project_world,
    is_visible,
)
from modular_slam_tpu.config import CameraConfig

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4)).astype(np.float32)
    return quat_normalize(jnp.asarray(q))


def random_poses(n):
    return Pose(q=random_quats(n), t=jnp.asarray(RNG.normal(size=(n, 3)).astype(np.float32)))


def test_quat_rotate_matches_matrix():
    q = random_quats(64)
    v = jnp.asarray(RNG.normal(size=(64, 3)).astype(np.float32))
    out1 = quat_rotate(q, v)
    out2 = jnp.einsum("nij,nj->ni", quat_to_matrix(q), v)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_matrix_quat_roundtrip():
    q = random_quats(256)
    q2 = matrix_to_quat(quat_to_matrix(q))
    # sign-canonicalized on both sides
    np.testing.assert_allclose(np.abs(np.sum(np.array(q) * np.array(q2), axis=-1)),
                               1.0, atol=1e-5)


def test_quat_multiply_associative_with_rotation():
    a, b = random_quats(32), random_quats(32)
    v = jnp.asarray(RNG.normal(size=(32, 3)).astype(np.float32))
    lhs = quat_rotate(quat_multiply(a, b), v)
    rhs = quat_rotate(a, quat_rotate(b, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = RNG.normal(size=(128, 3)).astype(np.float32)
    w *= (RNG.uniform(0.0, 2.5, size=(128, 1)) / np.maximum(
        np.linalg.norm(w, axis=-1, keepdims=True), 1e-9)).astype(np.float32)
    w = jnp.asarray(w)
    w2 = so3_log(quat_from_axis_angle(w))
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_so3_small_angle():
    w = jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32)) * 1e-7
    w2 = so3_log(quat_from_axis_angle(w))
    np.testing.assert_allclose(w, w2, atol=1e-9)


def test_se3_exp_log_roundtrip():
    # rotation magnitude < pi so the log is unique (log wraps at pi)
    xi = RNG.normal(size=(64, 6)).astype(np.float32)
    phi = xi[:, 3:]
    phi *= (RNG.uniform(0.0, 3.0, size=(64, 1)) / np.maximum(
        np.linalg.norm(phi, axis=-1, keepdims=True), 1e-9)).astype(np.float32)
    xi = jnp.asarray(xi)
    xi2 = se3_log(se3_exp(xi))
    np.testing.assert_allclose(xi, xi2, atol=2e-2)


def test_se3_log_exp_pose_roundtrip():
    p = random_poses(32)
    p2 = se3_exp(se3_log(p))
    np.testing.assert_allclose(
        np.abs(np.sum(np.array(p.q) * np.array(p2.q), axis=-1)), 1.0, atol=1e-5)
    # float32 V/V^-1 cancellation grows with theta; 1e-2 abs at theta up to pi
    np.testing.assert_allclose(p.t, p2.t, atol=1e-2)


def test_se3_small_delta_roundtrip_tight():
    """Optimizer retractions use small deltas — those must be precise."""
    xi = jnp.asarray(RNG.normal(size=(64, 6)).astype(np.float32)) * 1e-2
    xi2 = se3_log(se3_exp(xi))
    np.testing.assert_allclose(xi, xi2, atol=1e-6)


def test_pose_compose_inverse():
    p = random_poses(32)
    pinv = pose_inverse(p)
    pid = pose_compose(p, pinv)
    np.testing.assert_allclose(np.abs(pid.q[:, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(pid.t, 0.0, atol=1e-5)


def test_pose_apply_roundtrip():
    p = random_poses(8)
    pts = jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32))
    back = pose_apply_inverse(p, pose_apply(p, pts))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_pose_apply_broadcast_single_pose():
    p = Pose(q=random_quats(1)[0], t=jnp.asarray([1.0, 2.0, 3.0]))
    pts = jnp.asarray(RNG.normal(size=(100, 3)).astype(np.float32))
    out = pose_apply(p, pts)
    assert out.shape == (100, 3)
    back = pose_apply_inverse(p, out)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_project_backproject_identity():
    cam = camera_from_config(CameraConfig())
    uv = jnp.asarray(RNG.uniform([0, 0], [639, 479], size=(200, 2)).astype(np.float32))
    z = jnp.asarray(RNG.uniform(0.3, 5.0, size=(200,)).astype(np.float32))
    pts = backproject(cam, uv, z)
    uv2 = project(cam, pts)
    np.testing.assert_allclose(uv, uv2, atol=1e-3)
    np.testing.assert_allclose(pts[:, 2], z, atol=1e-6)


def test_world_camera_projection_consistency():
    """project_world(pose, p) == project(toCameraCoordinates(pose, p)) —
    mirrors reference projection.cpp:13-40 semantics."""
    cam = camera_from_config(CameraConfig())
    p = random_poses(1)
    pose = Pose(q=p.q[0], t=p.t[0])
    pts_cam = backproject(
        cam,
        jnp.asarray(RNG.uniform([0, 0], [639, 479], size=(50, 2)).astype(np.float32)),
        jnp.asarray(RNG.uniform(0.5, 3.0, size=(50,)).astype(np.float32)),
    )
    pts_world = pose_apply(pose, pts_cam)
    uv = project_world(cam, pose, pts_world)
    uv_direct = project(cam, pts_cam)
    np.testing.assert_allclose(uv, uv_direct, atol=1e-2)


def test_is_visible():
    cam = camera_from_config(CameraConfig())
    pts = jnp.asarray(
        [
            [0.0, 0.0, 1.0],     # center, visible
            [0.0, 0.0, -1.0],    # behind camera
            [10.0, 0.0, 1.0],    # off image
        ],
        dtype=jnp.float32,
    )
    vis = is_visible(cam, pts)
    assert vis.tolist() == [True, False, False]


def test_geometry_jits():
    cam = camera_from_config(CameraConfig())
    pose = identity_pose()

    @jax.jit
    def f(pts):
        return project_world(cam, pose, pts)

    out = f(jnp.ones((10, 3)))
    assert out.shape == (10, 2)
