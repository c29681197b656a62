"""Bundle-adjustment residuals and analytic Jacobians.

Two residual types, matching the reference and the standard alternative:

- **3D point-to-point** (the reference's choice, ceres_backend.cpp:19-60):
  r = T_cw * l_world - backproject(uv, depth)  in the camera frame.
  RGB-D depth makes this well-conditioned in all three directions.
- **2D reprojection** (MinMseTracker's form,
  ceres_reprojection_error_pnp.cpp:18-63): r = uv - project(T_cw * l).

Pose parametrization: left-multiplicative se(3) delta on the
camera-from-world transform T_cw (exp(xi) * T_cw), so
d(T_cw * l)/dxi = [I | -[p_c]x] and d(T_cw * l)/dl = R_cw.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from modular_slam_tpu.geometry.camera import Camera, backproject

Array = jnp.ndarray


class ObsData(NamedTuple):
    """Gathered per-observation data, ready for residual evaluation."""

    kf: Array        # [O] int32 keyframe slot
    lm: Array        # [O] int32 landmark slot
    p_obs: Array     # [O, 3] backprojected observed point (camera frame)
    uv: Array        # [O, 2]
    w: Array         # [O] base weight (0 = inactive)


def _skew(v: Array) -> Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(*v.shape[:-1], 3, 3)


def point2point_residuals(
    R_cw: Array,      # [K, 3, 3] camera-from-world rotations
    t_cw: Array,      # [K, 3]
    lm_pos: Array,    # [L, 3]
    obs: ObsData,
) -> Tuple[Array, Array, Array]:
    """-> (r [O, 3], Jp [O, 3, 6], Jl [O, 3, 3])."""
    Rk = R_cw[obs.kf]                     # [O, 3, 3]
    tk = t_cw[obs.kf]                     # [O, 3]
    l = lm_pos[obs.lm]                    # [O, 3]
    p_c = jnp.einsum("oij,oj->oi", Rk, l) + tk
    r = p_c - obs.p_obs
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (r.shape[0], 3, 3))
    Jp = jnp.concatenate([eye, -_skew(p_c)], axis=-1)   # [O, 3, 6]
    Jl = Rk
    return r, Jp, Jl


def reprojection_residuals(
    cam: Camera,
    R_cw: Array, t_cw: Array, lm_pos: Array, obs: ObsData,
) -> Tuple[Array, Array, Array]:
    """-> (r [O, 2], Jp [O, 2, 6], Jl [O, 2, 3])."""
    Rk = R_cw[obs.kf]
    tk = t_cw[obs.kf]
    l = lm_pos[obs.lm]
    p_c = jnp.einsum("oij,oj->oi", Rk, l) + tk
    x, y = p_c[:, 0], p_c[:, 1]
    z = jnp.where(p_c[:, 2] > 1e-6, p_c[:, 2], 1e-6)
    inv_z = 1.0 / z
    uv_hat = jnp.stack(
        [x * inv_z * cam.fx + cam.cx, y * inv_z * cam.fy + cam.cy], axis=-1
    )
    r = uv_hat - obs.uv
    fxz, fyz = cam.fx * inv_z, cam.fy * inv_z
    zero = jnp.zeros_like(fxz)
    Jproj = jnp.stack(
        [
            jnp.stack([fxz, zero, -fxz * x * inv_z], axis=-1),
            jnp.stack([zero, fyz, -fyz * y * inv_z], axis=-1),
        ],
        axis=-2,
    )  # [O, 2, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (r.shape[0], 3, 3))
    Jpc = jnp.concatenate([eye, -_skew(p_c)], axis=-1)  # [O, 3, 6]
    Jp = jnp.einsum("oij,ojk->oik", Jproj, Jpc)
    Jl = jnp.einsum("oij,ojk->oik", Jproj, Rk)
    return r, Jp, Jl


def huber_weights(r: Array, delta: float, base_w: Array) -> Array:
    """IRLS weights for the Huber loss on the residual norm."""
    nrm = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(nrm <= delta, 1.0, delta / jnp.maximum(nrm, 1e-12))
    return w * base_w


def gather_obs(cam: Camera, arena, active: Array) -> ObsData:
    """Build ObsData from arena observation rows; `active` [O] bool."""
    p_obs = backproject(cam, arena.obs_uv, arena.obs_depth)
    return ObsData(
        kf=arena.obs_kf,
        lm=arena.obs_lm,
        p_obs=p_obs,
        uv=arena.obs_uv,
        w=active.astype(jnp.float32),
    )
