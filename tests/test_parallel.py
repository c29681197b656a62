"""Multi-device sharding on the 8-device virtual CPU mesh: sharded Schur
BA matches single-device BA; DP tracking runs batched."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modular_slam_tpu.config import (
    SlamConfig, CameraConfig, DetectorConfig, MapConfig, PnpConfig,
    BackendConfig,
)
from modular_slam_tpu.parallel import (
    make_mesh, make_sharded_global_ba, make_batch_slam_step,
)
from modular_slam_tpu.parallel.dp import make_batch_init
from modular_slam_tpu.backend.ba import make_global_ba

from tests.test_backend_ba import _build_problem, _pose_errors, CAM_CFG


def test_mesh_creation():
    m = make_mesh(seq=2, obs=4)
    assert m.shape == {"seq": 2, "obs": 4}
    m2 = make_mesh(seq=1)
    assert m2.shape["obs"] == 8


def test_sharded_ba_matches_single_device():
    cam, arena, gt_poses, lm_gt = _build_problem(seed=7)
    cfg = SlamConfig(camera=CAM_CFG, backend=BackendConfig(max_iterations=10))

    # build twice: make_global_ba donates its input arena
    _, arena2, _, _ = _build_problem(seed=7)
    ref_arena, ref_stats = make_global_ba(cfg)(arena2)

    mesh = make_mesh(seq=1, obs=8)
    sharded = make_sharded_global_ba(cfg, mesh)
    sh_arena, sh_stats = sharded(arena)

    np.testing.assert_allclose(np.array(ref_stats.initial_cost),
                               np.array(sh_stats.initial_cost), rtol=1e-5)
    np.testing.assert_allclose(np.array(ref_arena.kf_t),
                               np.array(sh_arena.kf_t), atol=5e-5)
    np.testing.assert_allclose(np.array(ref_arena.kf_q),
                               np.array(sh_arena.kf_q), atol=5e-5)
    np.testing.assert_allclose(np.array(ref_arena.lm_pos),
                               np.array(sh_arena.lm_pos), atol=5e-4)
    # and it actually solved the problem
    dt, dr = _pose_errors(sh_arena, gt_poses)
    assert dt.max() < 2e-3


def test_dp_batched_tracking():
    cfg = SlamConfig(
        camera=CameraConfig(fx=100.0, fy=100.0, cx=79.5, cy=59.5,
                            width=160, height=120),
        detector=DetectorConfig(n_levels=2, max_keypoints=128),
        map=MapConfig(max_keyframes=8, max_landmarks=512,
                      max_observations=2048),
        pnp=PnpConfig(n_hypotheses=16),
    )
    mesh = make_mesh(seq=8, obs=1)
    step = make_batch_slam_step(cfg, mesh)
    arenas, states = make_batch_init(cfg, mesh, batch=8)

    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.uniform(0, 255, size=(8, 120, 160)).astype(np.float32))
    depths = jnp.ones((8, 120, 160), jnp.float32) * 2.0
    times = jnp.zeros((8,), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)

    arenas, states, results = step(arenas, states, grays, depths, times, keys)
    # first frame bootstraps every sequence independently
    assert np.array(arenas.n_kf).tolist() == [1] * 8
    assert bool(np.array(results.tracking_ok).all())
    assert np.array(states.frame_idx).tolist() == [1] * 8
