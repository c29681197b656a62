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
