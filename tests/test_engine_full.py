"""Full pipeline: tracking + keyframing + local BA (BASELINE config 2 shape)."""

import numpy as np
import jax.numpy as jnp

from modular_slam_tpu.config import (
    SlamConfig, CameraConfig, DetectorConfig, MapConfig, PnpConfig,
    BackendConfig,
)
from modular_slam_tpu.engine import SlamSystem, SlamResult
from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
from modular_slam_tpu.eval.ate import ate_rmse


def _cfg():
    return SlamConfig(
        camera=CameraConfig(fx=320.0, fy=320.0, cx=159.5, cy=119.5,
                            width=320, height=240),
        detector=DetectorConfig(n_levels=4, max_keypoints=384),
        map=MapConfig(max_keyframes=32, max_landmarks=4096,
                      max_observations=16384),
        pnp=PnpConfig(n_hypotheses=64),
        backend=BackendConfig(max_iterations=8),
    )


def _run(cfg, poses, gen, enable_backend):
    sys_ = SlamSystem(cfg, enable_backend=enable_backend)
    n_ok = 0
    for rgb, depth, ts in gen.sequence(poses):
        if sys_.process(rgb, depth, ts) == SlamResult.SUCCESS:
            n_ok += 1
    est = np.array([
        [ts, float(p.t[0]), float(p.t[1]), float(p.t[2]),
         float(p.q[1]), float(p.q[2]), float(p.q[3]), float(p.q[0])]
        for ts, p in sys_.trajectory
    ])
    gt = np.array([
        [k / 30.0, float(p.t[0]), float(p.t[1]), float(p.t[2]),
         float(p.q[1]), float(p.q[2]), float(p.q[3]), float(p.q[0])]
        for k, p in enumerate(poses)
    ])
    return sys_, n_ok, est, gt


def test_tracking_with_local_ba():
    cfg = _cfg()
    gen = PlaneSceneGenerator(cfg.camera, seed=31)
    poses = gen.trajectory(12, step_t=(0.2, 0.0, 0.0))
    sys_, n_ok, est, gt = _run(cfg, poses, gen, enable_backend=True)
    assert n_ok >= 10
    assert sys_.n_keyframes >= 2  # BA actually ran on new keyframes
    stats = ate_rmse(est, gt)
    assert stats["rmse"] < 0.02, stats


def test_ba_does_not_hurt_easy_sequence():
    cfg = _cfg()
    gen = PlaneSceneGenerator(cfg.camera, seed=32)
    poses = gen.trajectory(8, step_t=(0.02, 0.01, 0.0))
    _, n_ok_ba, est_ba, gt = _run(cfg, poses, gen, enable_backend=True)
    assert n_ok_ba == 8
    stats = ate_rmse(est_ba, gt)
    assert stats["rmse"] < 0.01, stats
