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


def test_loop_closure_with_small_gap():
    """Force keyframes every frame (high inlier threshold) so a revisit
    produces a loop candidate past min_gap."""
    import dataclasses
    from modular_slam_tpu.config import LoopConfig, TrackerConfig
    cfg = dataclasses.replace(
        _cfg(),
        loop=LoopConfig(min_gap_keyframes=4, min_score=0.10, min_inliers=25),
        tracker=TrackerConfig(new_keyframe_min_inliers=400),  # kf every frame
    )
    gen = PlaneSceneGenerator(cfg.camera, seed=34)
    out = gen.trajectory(6, step_t=(0.25, 0.0, 0.0))
    back = out[::-1][1:]
    poses = out + back
    sys_ = SlamSystem(cfg, enable_backend=False, enable_loop_closure=True)
    for rgb, depth, ts in gen.sequence(poses):
        sys_.process(rgb, depth, ts)
    assert sys_.n_keyframes >= 8
    assert sys_.n_loop_closures >= 1, (
        f"kf={sys_.n_keyframes}, no loop closures fired")


def test_relocalization_after_kidnap():
    """Travel far (covisibility gating forgets the start), then teleport
    back to the first view: normal tracking fails, BoW reloc recovers."""
    import dataclasses
    from modular_slam_tpu.config import TrackerConfig
    cfg = dataclasses.replace(
        _cfg(), tracker=TrackerConfig(new_keyframe_min_inliers=400))
    # wide texture so a long trajectory stays on-texture; 0.5m steps keep
    # covisibility local (adjacency ±3 kf), 12 kf > 3r+1 so 2-hop covis
    # from the end cannot reach the start landmarks
    gen = PlaneSceneGenerator(cfg.camera, texture_ppm=250, seed=35)
    poses = gen.trajectory(12, step_t=(0.5, 0.0, 0.0))
    frames = list(gen.sequence(poses))
    sys_ = SlamSystem(cfg, enable_backend=False, enable_relocalization=True)
    for f in frames:
        sys_.process(*f)
    assert sys_.n_keyframes >= 10
    # teleport back to the start view; ref keyframe is at the far end, so
    # 2-hop covisibility cannot see the start landmarks -> tracking fails
    res = sys_.process(*frames[0])
    assert sys_.n_relocalizations >= 1, "relocalizer did not fire"
    import jax.numpy as jnp
    pose = sys_.state.pose
    assert float(jnp.linalg.norm(pose.t - poses[0].t)) < 0.05
