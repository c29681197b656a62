"""Matcher (vs brute-force oracle) and RANSAC-PnP (synthetic scenes)."""

import numpy as np
import jax
import jax.numpy as jnp

from modular_slam_tpu.config import MatcherConfig, PnpConfig, CameraConfig
from modular_slam_tpu.ops.match import match_descriptors, hamming_matrix, dedupe_matches
from modular_slam_tpu.ops.pnp import ransac_pnp
from modular_slam_tpu.types import bits_to_pm1
from modular_slam_tpu.geometry import (
    camera_from_config, backproject, project, identity_pose, Pose,
    quat_from_axis_angle, pose_apply, pose_apply_inverse, quat_rotate,
)

RNG = np.random.default_rng(11)


def _rand_bits(n):
    return RNG.integers(0, 2, size=(n, 256)).astype(np.uint8)


def test_hamming_matrix_oracle():
    a, b = _rand_bits(33), _rand_bits(47)
    ours = np.array(hamming_matrix(bits_to_pm1(jnp.asarray(a)),
                                   bits_to_pm1(jnp.asarray(b))))
    ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(ours, ref)


def test_match_ratio_test():
    cfg = MatcherConfig(lowe_ratio=0.7)
    train = _rand_bits(20)
    # query 0: near-copy of train 3 (distance 5) -> unambiguous match
    q0 = train[3].copy()
    q0[:5] ^= 1
    # query 1: equidistant from train 5 and train 6 -> ratio test kills it
    t5 = train[5].copy()
    train[6] = t5.copy()
    q1 = t5.copy()
    q1[:30] ^= 1  # distance 30 to both
    query = np.stack([q0, q1])

    m = match_descriptors(
        bits_to_pm1(jnp.asarray(query)), jnp.array([True, True]),
        bits_to_pm1(jnp.asarray(train)), jnp.ones(20, bool), cfg)
    assert bool(m.valid[0]) and int(m.lm_slot[0]) == 3
    assert not bool(m.valid[1])


def test_match_respects_masks():
    cfg = MatcherConfig()
    train = _rand_bits(10)
    query = train[2:3].copy()  # exact copy of train 2
    tv = np.ones(10, bool)
    tv[2] = False  # mask out the true match
    m = match_descriptors(
        bits_to_pm1(jnp.asarray(query)), jnp.array([True]),
        bits_to_pm1(jnp.asarray(train)), jnp.asarray(tv), cfg)
    assert int(m.lm_slot[0]) != 2 or not bool(m.valid[0])
    # invalid query never matches
    m2 = match_descriptors(
        bits_to_pm1(jnp.asarray(query)), jnp.array([False]),
        bits_to_pm1(jnp.asarray(train)), jnp.ones(10, bool), cfg)
    assert not bool(m2.valid[0])


def test_dedupe_matches():
    from modular_slam_tpu.types import Matches
    m = Matches(
        lm_slot=jnp.array([4, 4, 7], dtype=jnp.int32),
        distance=jnp.array([10.0, 5.0, 3.0]),
        valid=jnp.array([True, True, True]),
    )
    out = dedupe_matches(m, 10)
    assert out.valid.tolist() == [False, True, True]


def _synthetic_scene(n=120, noise_px=0.0, outlier_frac=0.0, seed=0):
    """World points + observed pixels from a known pose."""
    rng = np.random.default_rng(seed)
    cam = camera_from_config(CameraConfig())
    # true camera pose (camera-to-world)
    true_pose = Pose(
        q=quat_from_axis_angle(jnp.asarray(rng.normal(size=3) * 0.1)),
        t=jnp.asarray(rng.normal(size=3) * 0.3),
    )
    # generate points in the camera frame, then lift to world
    uv = rng.uniform([40, 40], [600, 440], size=(n, 2)).astype(np.float32)
    z = rng.uniform(0.5, 4.0, size=(n,)).astype(np.float32)
    pts_cam = backproject(cam, jnp.asarray(uv), jnp.asarray(z))
    pts_world = pose_apply(true_pose, pts_cam)

    uv_obs = uv + rng.normal(size=uv.shape).astype(np.float32) * noise_px
    n_out = int(outlier_frac * n)
    if n_out:
        uv_obs[:n_out] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
    return cam, true_pose, jnp.asarray(pts_world), jnp.asarray(uv_obs), \
        pts_cam, n_out


def _pose_err(a: Pose, b: Pose):
    dt = float(jnp.linalg.norm(a.t - b.t))
    dq = float(jnp.abs(jnp.sum(a.q * b.q)))
    return dt, np.degrees(2 * np.arccos(min(dq, 1.0)))


def test_pnp_clean():
    cam, true_pose, pw, uv, pc, _ = _synthetic_scene()
    res = ransac_pnp(
        cam, pw, uv, pc, jnp.ones(pw.shape[0], bool), identity_pose(),
        jax.random.PRNGKey(0), PnpConfig())
    assert bool(res.ok)
    dt, dr = _pose_err(res.pose, true_pose)
    assert dt < 1e-3 and dr < 0.05, (dt, dr)
    assert int(res.n_inliers) == pw.shape[0]


def test_pnp_outliers_and_noise():
    cam, true_pose, pw, uv, pc, n_out = _synthetic_scene(
        noise_px=0.5, outlier_frac=0.3, seed=3)
    # outlier observations get wrong camera points too (depth from wrong pixel)
    res = ransac_pnp(
        cam, pw, uv, pc, jnp.ones(pw.shape[0], bool), identity_pose(),
        jax.random.PRNGKey(1), PnpConfig())
    assert bool(res.ok)
    dt, dr = _pose_err(res.pose, true_pose)
    assert dt < 0.02 and dr < 0.5, (dt, dr)
    inl = np.array(res.inliers)
    assert inl[n_out:].mean() > 0.95      # inliers kept
    assert inl[:n_out].mean() < 0.1       # outliers rejected


def test_pnp_warm_start_rescues_degenerate_sampling():
    """With zero valid depth points, only the warm-start hypothesis exists."""
    cam, true_pose, pw, uv, pc, _ = _synthetic_scene(seed=5)
    valid_depth = jnp.zeros(pw.shape[0], bool)  # no 3D-3D hypotheses
    res = ransac_pnp(cam, pw, uv, pc, valid_depth, true_pose,
                     jax.random.PRNGKey(2), PnpConfig())
    # no valid matches -> not ok
    assert not bool(res.ok)


def test_pnp_too_few_points():
    cam, true_pose, pw, uv, pc, _ = _synthetic_scene(n=120)
    valid = jnp.zeros(120, bool).at[:2].set(True)
    res = ransac_pnp(cam, pw, uv, pc, valid, identity_pose(),
                     jax.random.PRNGKey(3), PnpConfig())
    assert not bool(res.ok)


def test_pnp_jits_and_is_deterministic():
    cam, true_pose, pw, uv, pc, _ = _synthetic_scene(seed=9)
    f = jax.jit(ransac_pnp, static_argnames="cfg")
    r1 = f(cam, pw, uv, pc, jnp.ones(pw.shape[0], bool), identity_pose(),
           jax.random.PRNGKey(7), PnpConfig())
    r2 = f(cam, pw, uv, pc, jnp.ones(pw.shape[0], bool), identity_pose(),
           jax.random.PRNGKey(7), PnpConfig())
    np.testing.assert_array_equal(np.array(r1.pose.q), np.array(r2.pose.q))
    np.testing.assert_array_equal(np.array(r1.inliers), np.array(r2.inliers))
