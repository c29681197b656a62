"""Intensity-centroid orientation (IC angle).

Reference: orb_impl::ic_angle over a 31px circular patch
(distributed_cv_feature.cpp:543-570, u_max_ rows :522-541), exact atan2
instead of the reference's polynomial approximation (:465-501) — the VPU
has fast transcendentals, no need to approximate.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

IC_RADIUS = 15  # 31 px patch


def _circular_weights(radius: int) -> np.ndarray:
    """[2r+1, 2r+1] 1.0 inside the discrete circle (u_max-style rows)."""
    d = 2 * radius + 1
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    # u_max per row: floor(sqrt(r^2 - y^2) + 0.5) like the reference setup
    umax = np.floor(np.sqrt(radius * radius - ys.astype(np.float64) ** 2) + 0.5)
    return (np.abs(xs) <= umax).astype(np.float32)


from functools import lru_cache


@lru_cache(maxsize=None)
def _mask_np(radius: int) -> np.ndarray:
    return _circular_weights(radius)


def _mask(radius: int) -> Array:
    # host constant -> fresh jnp array per trace (never caches a tracer)
    return jnp.asarray(_mask_np(radius))


def gather_patches(img: Array, yx: Array, size: int) -> Array:
    """Gather [N, size, size] patches centered at integer yx [N, 2] (y, x).

    Starts are clamped to the image, so callers must mask out keypoints
    whose patch would cross the border (detector border >= radius).
    """
    h, w = img.shape
    r = size // 2
    start = yx - r
    start = jnp.clip(start, 0, jnp.array([h - size, w - size]))

    def one(s):
        return lax.dynamic_slice(img, (s[0], s[1]), (size, size))

    return jax.vmap(one)(start)


def ic_angle(img: Array, yx: Array, radius: int = IC_RADIUS) -> Array:
    """IC orientation [N] (radians) for keypoints at integer yx [N, 2]."""
    size = 2 * radius + 1
    patches = gather_patches(img, yx, size)  # [N, s, s]
    mask = _mask(radius)
    coords = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    wpatches = patches * mask
    m10 = jnp.einsum("nyx,x->n", wpatches, coords)
    m01 = jnp.einsum("nyx,y->n", wpatches, coords)
    return jnp.arctan2(m01, m10)


def moment_maps(img: Array, radius: int = IC_RADIUS) -> Array:
    """Dense IC moment maps [H, W, 2] = (m10, m01) via one 2-channel
    convolution — the MXU-native replacement for per-keypoint patch
    gathers (identical values at interior pixels; keypoints live >= 19 px
    from the border so the SAME-padding fringe is never sampled)."""
    mask = _mask_np(radius)
    coords = np.arange(-radius, radius + 1, dtype=np.float32)
    kx = (mask * coords[None, :]).astype(np.float32)   # weight * x
    ky = (mask * coords[:, None]).astype(np.float32)   # weight * y
    # conv kernels are cross-correlated by XLA with flipped spatial dims?
    # lax.conv_general_dilated computes true cross-correlation, so use
    # kernels as-is.
    kern = jnp.asarray(np.stack([kx, ky])[:, None])    # [2, 1, s, s]
    x = img[None, None]
    out = lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", preferred_element_type=jnp.float32
    )  # [1, 2, H, W]
    return jnp.moveaxis(out[0], 0, -1)
