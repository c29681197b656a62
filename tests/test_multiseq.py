"""Multi-sequence lock-step runner + device-side frame scan."""

import numpy as np
import jax
import jax.numpy as jnp

from modular_slam_tpu.parallel.multiseq import (
    MultiSequenceRunner, scaling_efficiency,
)
from modular_slam_tpu.parallel.mesh import make_mesh
from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
from tests.test_engine_tracking import _small_cfg


def test_multiseq_runner_tracks_independent_sequences():
    cfg = _small_cfg()
    mesh = make_mesh(seq=4, obs=2)
    runner = MultiSequenceRunner(cfg, batch=4, mesh=mesh)

    seqs = []
    steps = [(0.02, 0, 0), (0, 0.02, 0), (-0.02, 0, 0), (0, -0.02, 0)]
    for b in range(4):
        gen = PlaneSceneGenerator(cfg.camera, seed=70 + b)
        poses = gen.trajectory(4, step_t=steps[b])
        seqs.append(list(gen.sequence(poses)))

    report = runner.run(seqs)
    assert report["frames_per_sequence"] == 4
    assert report["total_frames"] == 16
    # each sequence tracked its own direction
    ends = [np.array(tr[-1][1].t) for tr in runner.trajectories]
    np.testing.assert_allclose(ends[0], [0.06, 0, 0], atol=0.02)
    np.testing.assert_allclose(ends[1], [0, 0.06, 0], atol=0.02)
    np.testing.assert_allclose(ends[2], [-0.06, 0, 0], atol=0.02)
    np.testing.assert_allclose(ends[3], [0, -0.06, 0], atol=0.02)


def test_scaling_efficiency_formula():
    assert scaling_efficiency(16.0, 10.0, 2) == 0.8


def test_slam_scan_matches_stepwise():
    from modular_slam_tpu.engine import make_slam_scan, make_slam_step
    from modular_slam_tpu.frontend.tracker import initial_state
    from modular_slam_tpu.map.arena import empty_arena

    cfg = _small_cfg()
    gen = PlaneSceneGenerator(cfg.camera, seed=71)
    poses = gen.trajectory(5, step_t=(0.02, 0.0, 0.0))
    w = np.array([0.299, 0.587, 0.114], np.float32)
    grays, depths, times = [], [], []
    for rgb, d, t in gen.sequence(poses):
        grays.append(rgb.astype(np.float32) @ w)
        depths.append(d)
        times.append(t)
    grays = jnp.asarray(np.stack(grays))
    depths = jnp.asarray(np.stack(depths))
    times = jnp.asarray(times, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), 5)

    scan = make_slam_scan(cfg)
    a1, s1, res = scan(empty_arena(cfg.map), initial_state(), grays, depths,
                       times, keys)
    assert bool(np.array(res.tracking_ok).all())

    step = make_slam_step(cfg)
    a2, s2 = empty_arena(cfg.map), initial_state()
    for i in range(5):
        a2, s2, r, _ = step(a2, s2, grays[i], depths[i], times[i], keys[i])
    np.testing.assert_allclose(np.array(s1.pose.t), np.array(s2.pose.t),
                               atol=1e-6)
    assert int(a1.n_kf) == int(a2.n_kf)
    assert int(a1.n_lm) == int(a2.n_lm)
