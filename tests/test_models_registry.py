"""Pipeline presets, builder, and the component registry."""

import numpy as np
import pytest

from modular_slam_tpu.models import (
    make_pipeline, odometry_pipeline, full_slam_pipeline, SlamBuilder,
)
from modular_slam_tpu.utils import registry as reg
from tests.test_engine_tracking import _small_cfg


def test_pipeline_presets():
    s = make_pipeline("odometry", _small_cfg())
    assert not s.enable_backend
    s = make_pipeline("slam", _small_cfg())
    assert s.enable_backend and not s.enable_loop_closure
    s = make_pipeline("full", _small_cfg())
    assert s.enable_backend and s.enable_loop_closure \
        and s.enable_relocalization
    with pytest.raises(KeyError):
        make_pipeline("nope")


def test_registry_builtins_present():
    assert "orb_grid" in reg.available("detector")
    assert "hamming_2nn" in reg.available("matcher")
    assert "ransac_3p" in reg.available("pnp")
    assert "tum_files" in reg.available("data_provider")


def test_registry_create_and_errors():
    cfg = _small_cfg()
    det = reg.create("detector", "orb_grid", cfg)
    import jax.numpy as jnp
    feats = det(jnp.zeros((120, 160)), jnp.zeros((120, 160)))
    assert feats.keypoints.uv.shape[0] == cfg.detector.max_keypoints
    with pytest.raises(KeyError):
        reg.create("detector", "missing", cfg)
    with pytest.raises(ValueError):
        reg.register("nonsense_kind", "x")


def test_custom_plugin_registration():
    calls = []

    @reg.register("detector", "test_custom")
    def _factory(cfg):
        calls.append(cfg)
        return "custom-detector"

    assert "test_custom" in reg.available("detector")
    assert reg.create("detector", "test_custom", None) == "custom-detector"


def test_builder_fluent():
    seen = []
    system = (SlamBuilder(_small_cfg())
              .with_pipeline("odometry")
              .with_detector("orb_grid")
              .with_matcher("hamming_2nn")
              .with_pnp("ransac_3p")
              .with_seed(3)
              .on_frame(lambda ts, pose, res: seen.append(ts))
              .build())
    assert system.component_names["detector"] == "orb_grid"
    # observers fire per processed frame
    from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
    gen = PlaneSceneGenerator(system.cfg.camera, seed=61)
    rgb, depth = gen.render(gen.trajectory(1)[0])
    system.process(rgb, depth, 1.5)
    assert seen == [1.5]


def test_builder_rejects_unknown_component():
    with pytest.raises(KeyError):
        SlamBuilder(_small_cfg()).with_detector("bogus")


def test_custom_detector_composes_into_engine():
    """A registry-registered detector observably changes engine behavior
    through SlamBuilder.with_detector(...).build() — real DI, not a
    recorded name (reference: rgbd_feature_frontend.cpp:140-154)."""
    import jax.numpy as jnp
    from modular_slam_tpu.ops.detector import detect

    CAP = 16

    @reg.register("detector", "capped16")
    def _capped(cfg):
        def _detect(gray, depth):
            feats = detect(gray, depth, cfg.detector)
            keep = jnp.arange(feats.keypoints.valid.shape[0]) < CAP
            kps = feats.keypoints._replace(valid=feats.keypoints.valid & keep)
            return feats._replace(keypoints=kps)
        return _detect

    from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
    cfg = _small_cfg()
    gen = PlaneSceneGenerator(cfg.camera, seed=61)
    rgb, depth = gen.render(gen.trajectory(1)[0])

    default = (SlamBuilder(cfg).with_pipeline("odometry").build())
    default.process(rgb, depth, 0.0)
    custom = (SlamBuilder(cfg).with_pipeline("odometry")
              .with_detector("capped16").build())
    custom.process(rgb, depth, 0.0)

    # bootstrap turns valid-depth keypoints into landmarks: the capped
    # detector's map is observably smaller
    assert custom.n_landmarks <= CAP
    assert default.n_landmarks > CAP


def test_custom_pnp_composes_into_engine():
    """An injected PnP solver's pose is the pose the engine reports."""
    import jax.numpy as jnp
    from modular_slam_tpu.ops.pnp import PnpResult
    from modular_slam_tpu.geometry.se3 import Pose

    T_FIXED = (9.0, -3.0, 7.0)

    @reg.register("pnp", "fixed_pose")
    def _fixed(cfg):
        def _pnp(pts_world, uv, pts_cam, valid, init_pose, key):
            pose = Pose(q=jnp.array([1.0, 0, 0, 0], jnp.float32),
                        t=jnp.asarray(T_FIXED, jnp.float32))
            return PnpResult(pose=pose, inliers=valid,
                             n_inliers=jnp.sum(valid.astype(jnp.int32)),
                             ok=jnp.array(True))
        return _pnp

    from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
    cfg = _small_cfg()
    gen = PlaneSceneGenerator(cfg.camera, seed=61)
    poses = gen.trajectory(2, step_t=(0.01, 0.0, 0.0))
    system = (SlamBuilder(cfg).with_pipeline("odometry")
              .with_pnp("fixed_pose").build())
    for rgb, depth, ts in gen.sequence(poses):
        system.process(rgb, depth, ts)
    # frame 0 bootstraps at identity; frame 1 tracks through the custom PnP
    t1 = np.asarray(system.trajectory[1][1].t)
    np.testing.assert_allclose(t1, np.array(T_FIXED), atol=1e-6)


def test_custom_matcher_composes_into_engine():
    """A matcher that rejects everything makes tracking fail — proof the
    injected matcher is on the engine path."""
    import jax.numpy as jnp
    from modular_slam_tpu.types import Matches

    @reg.register("matcher", "reject_all")
    def _reject(cfg):
        def _match(q, qv, t, tv):
            n = q.shape[0]
            return Matches(lm_slot=jnp.zeros(n, jnp.int32),
                           distance=jnp.full(n, 256.0, jnp.float32),
                           valid=jnp.zeros(n, bool))
        return _match

    from modular_slam_tpu.engine import SlamResult
    from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
    cfg = _small_cfg()
    gen = PlaneSceneGenerator(cfg.camera, seed=61)
    poses = gen.trajectory(2, step_t=(0.01, 0.0, 0.0))
    system = (SlamBuilder(cfg).with_pipeline("odometry")
              .with_matcher("reject_all").build())
    results = [system.process(rgb, depth, ts)
               for rgb, depth, ts in gen.sequence(poses)]
    assert results[0] == SlamResult.SUCCESS          # bootstrap
    assert results[1] == SlamResult.NO_CONSTRAINTS   # no matches -> lost
