"""Injected component set — the reference's constructor-injection DI,
functional style.

The reference assembles its frontend from interchangeable parts chosen at
build time: SlamBuilder collects provider/detector/matcher/PnP/map/backend
(slam_builder.hpp:93-177) and RgbdFeatureFrontend receives detector,
matcher and PnP solver through its constructor
(rgbd_feature_frontend.cpp:140-154).  Here the same contract is a
NamedTuple of jittable closures: the engine step (engine.make_slam_step /
make_slam_scan) and the tracking frontend (frontend.tracker.track_frame)
call through these functions, so a registry-selected or user-registered
component observably changes engine behavior — not just a recorded name.

Component contracts (all traced under jit; static shapes, masked):
  detect(gray [H,W], depth [H,W]) -> Features
  match(q_desc_pm1 [N,256], q_valid [N], lm_desc [L,256], lm_mask [L])
      -> Matches                        (raw; the frontend dedupes)
  pnp(pts_world [N,3], uv [N,2], pts_cam [N,3], valid [N],
      init_pose, key) -> PnpResult
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.utils import registry as reg

DEFAULT_NAMES: Dict[str, str] = {
    "detector": "orb_grid",
    "matcher": "hamming_2nn",
    "pnp": "ransac_3p",
}


class Components(NamedTuple):
    detect: Callable
    match: Callable
    pnp: Callable
    names: Dict[str, str]


def build_components(
    cfg: SlamConfig, names: Optional[Dict[str, str]] = None
) -> Components:
    """Instantiate the selected detector/matcher/pnp from the registry.

    `names` maps component kind -> registry name; unspecified kinds use
    the built-in defaults.  Each factory is called with the full config
    (SlamComponent-style init, slam_component.hpp:10-26) and must return
    a closure matching the module-doc contract."""
    picked = dict(DEFAULT_NAMES)
    if names:
        unknown = set(names) - set(DEFAULT_NAMES)
        if unknown:
            raise KeyError(
                f"unknown component kinds {sorted(unknown)}; "
                f"injectable kinds: {sorted(DEFAULT_NAMES)}")
        picked.update(names)
    return Components(
        detect=reg.create("detector", picked["detector"], cfg),
        match=reg.create("matcher", picked["matcher"], cfg),
        pnp=reg.create("pnp", picked["pnp"], cfg),
        names=picked,
    )
