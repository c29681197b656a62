"""Pipeline presets — the configurations a reference user runs.

Maps the reference's two applications + intended-but-dead features onto
named factories (BASELINE measurement configs):

- "odometry":  tracking only — what the reference actually ships running
  (backend disabled at ceres_backend.cpp:95, loop closure stubbed)
- "slam":      tracking + local BA per keyframe (config 2)
- "full":      tracking + BA + loop closure + relocalization (config 3)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.engine import SlamSystem


def odometry_pipeline(cfg: Optional[SlamConfig] = None, **kw) -> SlamSystem:
    return SlamSystem(cfg or SlamConfig(), enable_backend=False, **kw)


def slam_pipeline(cfg: Optional[SlamConfig] = None, **kw) -> SlamSystem:
    return SlamSystem(cfg or SlamConfig(), enable_backend=True, **kw)


def full_slam_pipeline(cfg: Optional[SlamConfig] = None, **kw) -> SlamSystem:
    return SlamSystem(cfg or SlamConfig(), enable_backend=True,
                      enable_loop_closure=True, enable_relocalization=True,
                      **kw)


PIPELINES: Dict[str, Callable[..., SlamSystem]] = {
    "odometry": odometry_pipeline,
    "slam": slam_pipeline,
    "full": full_slam_pipeline,
}


def make_pipeline(name: str, cfg: Optional[SlamConfig] = None,
                  **kw) -> SlamSystem:
    if name not in PIPELINES:
        raise KeyError(f"unknown pipeline {name!r}; one of {sorted(PIPELINES)}")
    return PIPELINES[name](cfg, **kw)
