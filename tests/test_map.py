"""Map arena: insertion, masking, covisibility, k-hop queries, overflow."""

import numpy as np
import jax
import jax.numpy as jnp

from modular_slam_tpu.config import MapConfig
from modular_slam_tpu.geometry.se3 import identity_pose, Pose
from modular_slam_tpu.map import (
    empty_arena, add_keyframe, add_landmarks, add_observations,
    covis_counts, khop_keyframes, visible_landmarks, apply_backend_update,
)

CFG = MapConfig(max_keyframes=8, max_landmarks=32, max_observations=64,
                descriptor_bits=16)


def _desc(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.choice([-1, 1], size=(n, 16)).astype(np.int8))


def _pose(x):
    return Pose(q=jnp.array([1.0, 0, 0, 0]), t=jnp.array([x, 0.0, 0.0]))


def test_keyframe_insertion_and_overflow():
    a = empty_arena(CFG)
    for i in range(10):
        a, slot = add_keyframe(a, _pose(float(i)), jnp.float32(i))
        if i < 8:
            assert int(slot) == i
        else:
            assert int(slot) == 8  # dropped
    assert int(a.n_kf) == 8
    assert a.kf_valid.sum() == 8
    np.testing.assert_allclose(a.kf_t[:, 0], np.arange(8))


def test_landmark_batch_insertion_masked():
    a = empty_arena(CFG)
    pos = jnp.arange(15).reshape(5, 3).astype(jnp.float32)
    valid = jnp.array([True, False, True, True, False])
    a, slots = add_landmarks(a, pos, _desc(5), valid)
    assert slots.tolist() == [0, 32, 1, 2, 32]
    assert int(a.n_lm) == 3
    np.testing.assert_allclose(np.array(a.lm_pos[1]), [6, 7, 8])


def test_landmark_overflow_drops():
    a = empty_arena(CFG)
    pos = jnp.zeros((40, 3))
    a, slots = add_landmarks(a, pos, _desc(40), jnp.ones(40, bool))
    assert int(a.n_lm) == 32
    assert int(a.lm_valid.sum()) == 32
    assert (np.array(slots[32:]) == 32).all()


def _build_covis_scene():
    """kf0 sees lm {0,1}, kf1 sees {1,2}, kf2 sees {2,3}, kf3 sees {5} (isolated)."""
    a = empty_arena(CFG)
    pos = jnp.zeros((6, 3))
    a, lm = add_landmarks(a, pos, _desc(6), jnp.ones(6, bool))
    sees = [(0, [0, 1]), (1, [1, 2]), (2, [2, 3]), (3, [5])]
    for kf_idx, lms in sees:
        a, slot = add_keyframe(a, _pose(float(kf_idx)), jnp.float32(kf_idx))
        ls = jnp.array(lms + [0] * (2 - len(lms)) if len(lms) < 2 else lms,
                       dtype=jnp.int32)
        v = jnp.array([True] * len(lms) + [False] * (2 - len(lms))
                      if len(lms) < 2 else [True] * len(lms))
        a = add_observations(a, slot, ls, jnp.zeros((ls.shape[0], 2)),
                             jnp.ones(ls.shape[0]), _desc(ls.shape[0]), v)
    return a


def test_covisibility_counts():
    a = _build_covis_scene()
    c = np.array(covis_counts(a))
    assert c[0, 1] == 1 and c[1, 2] == 1
    assert c[0, 2] == 0 and c[0, 3] == 0
    assert c[0, 0] == 2  # kf0 observes 2 landmarks


def test_khop():
    a = _build_covis_scene()
    h1 = np.array(khop_keyframes(a, jnp.int32(0), 1))
    assert h1[:4].tolist() == [True, True, False, False]
    h2 = np.array(khop_keyframes(a, jnp.int32(0), 2))
    assert h2[:4].tolist() == [True, True, True, False]
    h3 = np.array(khop_keyframes(a, jnp.int32(0), 3))
    assert h3[:4].tolist() == [True, True, True, False]  # kf3 isolated


def test_visible_landmarks():
    a = _build_covis_scene()
    mask = khop_keyframes(a, jnp.int32(0), 1)  # kf0, kf1
    lm = np.array(visible_landmarks(a, mask))
    assert lm[:6].tolist() == [True, True, True, False, False, False]


def test_observation_payloads():
    a = _build_covis_scene()
    n = int(a.n_obs)
    assert n == 7
    ov = np.array(a.obs_valid)
    assert ov[:n].all() and not ov[n:].any()
    # kf0's two observations reference lm 0,1
    kf = np.array(a.obs_kf[:n])
    lm = np.array(a.obs_lm[:n])
    assert set(lm[kf == 0].tolist()) == {0, 1}


def test_descriptor_refresh_most_recent():
    a = empty_arena(CFG)
    pos = jnp.zeros((1, 3))
    d0, d1 = _desc(1, seed=1), _desc(1, seed=2)
    a, lm = add_landmarks(a, pos, d0, jnp.ones(1, bool))
    a, k0 = add_keyframe(a, _pose(0.0), jnp.float32(0))
    a = add_observations(a, k0, lm, jnp.zeros((1, 2)), jnp.ones(1), d1,
                         jnp.ones(1, bool))
    np.testing.assert_array_equal(np.array(a.lm_desc[0]), np.array(d1[0]))


def test_backend_update_masks():
    a = _build_covis_scene()
    new_t = a.kf_t + 1.0
    kf_mask = jnp.zeros(8, bool).at[1].set(True)
    a2 = apply_backend_update(a, a.kf_q, new_t, a.lm_pos + 5.0,
                              kf_mask, jnp.zeros(32, bool))
    np.testing.assert_allclose(np.array(a2.kf_t[1]), np.array(a.kf_t[1]) + 1.0)
    np.testing.assert_allclose(np.array(a2.kf_t[0]), np.array(a.kf_t[0]))
    np.testing.assert_allclose(np.array(a2.lm_pos), np.array(a.lm_pos))


def test_arena_ops_jit():
    @jax.jit
    def build():
        a = empty_arena(CFG)
        a, k = add_keyframe(a, _pose(1.0), jnp.float32(0))
        a, lm = add_landmarks(a, jnp.ones((4, 3)), _desc(4),
                              jnp.ones(4, bool))
        a = add_observations(a, k, lm, jnp.zeros((4, 2)), jnp.ones(4),
                             _desc(4), jnp.ones(4, bool))
        return a

    a = build()
    assert int(a.n_kf) == 1 and int(a.n_lm) == 4 and int(a.n_obs) == 4
