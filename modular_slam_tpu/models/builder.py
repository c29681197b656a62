"""Fluent SLAM system builder — reference SlamBuilder parity
(slam_builder.hpp:93-177): pick components by registry name, register
observer actions, build a runnable system.

    system = (SlamBuilder(cfg)
              .with_detector("orb_grid")
              .with_pipeline("full")
              .on_frame(lambda ts, pose, res: ...)
              .build())
"""

from __future__ import annotations

from typing import Callable, List, Optional

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.engine import SlamSystem
from modular_slam_tpu.utils import registry as reg


class SlamBuilder:
    def __init__(self, cfg: Optional[SlamConfig] = None):
        self._cfg = cfg or SlamConfig()
        self._pipeline = "slam"
        self._detector = "orb_grid"
        self._matcher = "hamming_2nn"
        self._pnp = "ransac_3p"
        self._frame_actions: List[Callable] = []
        self._seed = 0

    def with_config(self, cfg: SlamConfig) -> "SlamBuilder":
        self._cfg = cfg
        return self

    def with_pipeline(self, name: str) -> "SlamBuilder":
        self._pipeline = name
        return self

    def with_detector(self, name: str) -> "SlamBuilder":
        if name not in reg.available("detector"):
            raise KeyError(f"unknown detector {name!r}")
        self._detector = name
        return self

    def with_matcher(self, name: str) -> "SlamBuilder":
        if name not in reg.available("matcher"):
            raise KeyError(f"unknown matcher {name!r}")
        self._matcher = name
        return self

    def with_pnp(self, name: str) -> "SlamBuilder":
        if name not in reg.available("pnp"):
            raise KeyError(f"unknown pnp {name!r}")
        self._pnp = name
        return self

    def with_seed(self, seed: int) -> "SlamBuilder":
        self._seed = seed
        return self

    def on_frame(self, fn: Callable) -> "SlamBuilder":
        """frontendFinished-style observer (slam_builder.hpp:70-78)."""
        self._frame_actions.append(fn)
        return self

    def build(self) -> SlamSystem:
        from modular_slam_tpu.models.pipelines import make_pipeline

        # the selected components are instantiated from the registry and
        # composed into the jitted engine step (reference injection,
        # rgbd_feature_frontend.cpp:140-154 via slam_builder.hpp:170-177)
        system = make_pipeline(
            self._pipeline, self._cfg, seed=self._seed,
            component_names={
                "detector": self._detector,
                "matcher": self._matcher,
                "pnp": self._pnp,
            })
        for fn in self._frame_actions:
            system.register_frame_observer(fn)
        return system
