"""Separable Gaussian blur (pre-descriptor smoothing).

Reference: 7x7 sigma=2 GaussianBlur with BORDER_REFLECT_101 before BRIEF
description (distributed_cv_feature.cpp:797-798).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: Array, ksize: int = 7, sigma: float = 2.0) -> Array:
    """[H, W] float32 -> blurred [H, W]; reflect-101 borders like OpenCV."""
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    r = ksize // 2
    # reflect-101 padding (edge pixel not duplicated)
    padded = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    # separable conv: rows then cols, via conv_general_dilated on NCHW
    x = padded[None, None, :, :]
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID")
    return x[0, 0]
