"""Profile local BA on a realistic tracking-produced arena.

Times the full make_local_ba call and its pieces (compaction, dense LM
core at various iteration counts, arena scatter-back) so optimization
targets the real cost, not a guess.  Run on the real device:

    python tools/ba_bench.py
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.engine import make_slam_scan
from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
from modular_slam_tpu.frontend.tracker import initial_state
from modular_slam_tpu.map.arena import MapArena, empty_arena
from modular_slam_tpu.utils import setup_compile_cache


def timeit(fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def build_arena(cfg, n_frames=48):
    gen = PlaneSceneGenerator(cfg.camera, seed=42)
    poses = gen.trajectory(n_frames, step_t=(0.05, 0.02, 0.01),
                           step_rot=(0.004, 0.008, 0.004))
    frames = [(rgb, depth, ts) for rgb, depth, ts in gen.sequence(poses)]
    w = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
    grays = jnp.stack([
        jnp.tensordot(jnp.asarray(rgb).astype(jnp.float32), w, 1)
        for rgb, _, _ in frames])
    depths = jnp.stack([jnp.asarray(d) for _, d, _ in frames])
    times = jnp.asarray([ts for _, _, ts in frames], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), len(frames))
    scan = make_slam_scan(cfg)
    arena, state, res = scan(empty_arena(cfg.map), initial_state(),
                             grays, depths, times, keys)
    jax.block_until_ready(arena)
    kf_slots = np.asarray(res.kf_slot)
    new_kf = np.asarray(res.new_keyframe)
    last_kf = int(kf_slots[np.nonzero(new_kf)[0][-1]])
    print(f"arena: {int(arena.n_kf)} kf, {int(arena.n_lm)} lm, "
          f"{int(arena.n_obs)} obs; last kf_slot={last_kf}", file=sys.stderr)
    return arena, state, last_kf


def main():
    setup_compile_cache()
    cfg = SlamConfig()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    arena, state, kf_slot = build_arena(cfg)
    slot = jnp.int32(kf_slot)

    from modular_slam_tpu.backend.ba import make_local_ba, ba_core_dense
    from modular_slam_tpu.backend import ba as ba_mod

    # --- full local BA (non-donating so it can be re-timed) ---------------
    ba = make_local_ba(cfg)
    ba_nd = jax.jit(ba.__wrapped__)
    print(f"local_ba total: {timeit(lambda: ba_nd(arena, state, slot)):.2f} ms")

    # --- compaction only ---------------------------------------------------
    from modular_slam_tpu.map.arena import khop_keyframes, visible_landmarks
    from modular_slam_tpu.geometry.camera import (backproject,
                                                  camera_from_config)
    from modular_slam_tpu.backend.residuals import ObsData
    from jax import lax

    cam = camera_from_config(cfg.camera)
    bcfg = dataclasses.replace(
        cfg.backend, max_iterations=cfg.backend.local_max_iterations)
    Kc, Lc, Oc = bcfg.local_kf_cap, bcfg.local_lm_cap, bcfg.local_obs_cap

    def compact(arena: MapArena, kf_slot):
        K, L, O = (arena.max_keyframes, arena.max_landmarks,
                   arena.max_observations)
        window = khop_keyframes(arena, kf_slot, bcfg.local_window_depth)
        window = window & arena.kf_valid
        lm_active = visible_landmarks(arena, window)
        obs_active = (arena.obs_valid & window[arena.obs_kf]
                      & lm_active[arena.obs_lm])
        idx_all = jnp.nonzero(window, size=K, fill_value=K)[0]
        n_w = jnp.sum(window.astype(jnp.int32))
        start = jnp.maximum(n_w - Kc, 0)
        kf_idx = lax.dynamic_slice(idx_all, (start,), (Kc,))
        lm_idx = jnp.nonzero(lm_active, size=Lc, fill_value=L)[0]
        obs_idx = jnp.nonzero(obs_active, size=Oc, fill_value=O)[0]
        kf_ok = kf_idx < K
        lm_ok = lm_idx < L
        inv_kf = jnp.full((K,), Kc, jnp.int32).at[kf_idx].set(
            jnp.arange(Kc, dtype=jnp.int32), mode="drop")
        inv_lm = jnp.full((L,), Lc, jnp.int32).at[lm_idx].set(
            jnp.arange(Lc, dtype=jnp.int32), mode="drop")
        kf_g = jnp.clip(kf_idx, 0, K - 1)
        lm_g = jnp.clip(lm_idx, 0, L - 1)
        obs_g = jnp.clip(obs_idx, 0, O - 1)
        o_kf = inv_kf[arena.obs_kf[obs_g]]
        o_lm = inv_lm[arena.obs_lm[obs_g]]
        ok = (obs_idx < O) & (o_kf < Kc) & (o_lm < Lc)
        uv = arena.obs_uv[obs_g]
        depth = arena.obs_depth[obs_g]
        obs = ObsData(kf=jnp.where(ok, o_kf, 0), lm=jnp.where(ok, o_lm, 0),
                      p_obs=backproject(cam, uv, depth), uv=uv,
                      w=ok.astype(jnp.float32))
        return (arena.kf_q[kf_g], arena.kf_t[kf_g], arena.lm_pos[lm_g],
                obs, kf_ok & (jnp.arange(Kc) != 0), lm_ok)

    compact_j = jax.jit(compact)
    print(f"compact only: {timeit(lambda: compact_j(arena, slot)):.2f} ms")

    kf_q, kf_t, lm_pos, obs, pose_free, lm_ok = jax.block_until_ready(
        compact_j(arena, slot))
    print(f"window: {int(pose_free.sum())+1} kf, {int(lm_ok.sum())} lm, "
          f"{int((obs.w > 0).sum())} obs", file=sys.stderr)

    # --- dense core at various iteration counts ----------------------------
    for iters in (1, 2, 5, 10):
        b = dataclasses.replace(bcfg, max_iterations=iters)
        core = jax.jit(lambda q, t, l, o, b=b: ba_core_dense(
            cam, q, t, l, o, pose_free, lm_ok, b,
            residual_type=bcfg.local_residual))
        ms = timeit(lambda: core(kf_q, kf_t, lm_pos, obs), n=10)
        print(f"dense core {iters:2d} iters: {ms:.2f} ms")


if __name__ == "__main__":
    main()
