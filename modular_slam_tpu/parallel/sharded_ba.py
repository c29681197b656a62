"""Distributed Schur-complement bundle adjustment over a device mesh.

The BASELINE north star: shard the observation edge list across the mesh
"obs" axis; every device holds the (small, replicated) keyframe/landmark
state and its observation shard.  Each LM linearization and each CG
matvec does its segment-sum locally and psums the [K,6,6]/[L,3]-shaped
partials over ICI — the same `ba_core` code as single-chip, entered
through shard_map with `allreduce = psum` (backend/ba.py).

Communication per CG iteration: 2 psums of ~[L,3] + [K,6] floats; per LM
iteration additionally U/V/b psums — all tiny next to the O(obs)
compute, which is what makes the scaling efficient.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modular_slam_tpu.backend.ba import ba_core, BAStats
from modular_slam_tpu.backend.residuals import ObsData
from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.geometry.camera import camera_from_config, backproject
from modular_slam_tpu.map.arena import MapArena

Array = jnp.ndarray


def make_sharded_global_ba(cfg: SlamConfig, mesh: Mesh,
                           axis: str = "obs") -> Callable:
    """Global BA with the observation list sharded over `axis`.

    Returns jitted fn(arena) -> (arena, BAStats).  The arena stays
    replicated except the observation arrays, which are split across the
    axis (capacities must be divisible by the axis size — MapConfig
    defaults are powers of two).
    """
    cam = camera_from_config(cfg.camera)
    bcfg = cfg.backend
    n_shards = mesh.shape[axis]

    def _shard_body(kf_q, kf_t, lm_pos, kf_valid, lm_valid,
                    obs_kf, obs_lm, obs_uv, obs_depth, obs_active):
        # local observation shard -> ObsData
        p_obs = backproject(cam, obs_uv, obs_depth)
        obs = ObsData(
            kf=obs_kf, lm=obs_lm, p_obs=p_obs, uv=obs_uv,
            w=obs_active.astype(jnp.float32),
        )
        slot0 = jnp.arange(kf_q.shape[0]) == 0
        pose_free = kf_valid & ~slot0
        lm_free = lm_valid
        q, t, lm, stats = ba_core(
            cam, kf_q, kf_t, lm_pos, obs, pose_free, lm_free, bcfg,
            residual_type=bcfg.global_residual,
            allreduce=lambda x: lax.psum(x, axis),
        )
        return q, t, lm, stats

    rep = P()
    shd = P(axis)
    sharded = jax.shard_map(
        _shard_body,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, shd, shd, shd, shd, shd),
        out_specs=(rep, rep, rep,
                   BAStats(rep, rep, rep, rep, rep)),
    )

    @jax.jit
    def global_ba(arena: MapArena):
        O = arena.max_observations
        assert O % n_shards == 0, (O, n_shards)
        kf_q, kf_t, lm_pos, stats = sharded(
            arena.kf_q, arena.kf_t, arena.lm_pos,
            arena.kf_valid, arena.lm_valid,
            arena.obs_kf, arena.obs_lm, arena.obs_uv, arena.obs_depth,
            arena.obs_valid,
        )
        arena = arena._replace(kf_q=kf_q, kf_t=kf_t, lm_pos=lm_pos)
        return arena, stats

    return global_ba
