"""Separable Gaussian blur (pre-descriptor smoothing).

Reference: 7x7 sigma=2 GaussianBlur with BORDER_REFLECT_101 before BRIEF
description (distributed_cv_feature.cpp:797-798).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: Array, ksize: int = 7, sigma: float = 2.0) -> Array:
    """[H, W] float32 -> blurred [H, W]; reflect-101 borders like OpenCV.

    Separable filter written as shifted multiply-adds (fused on the VPU)
    rather than lax.conv — single-channel convs waste the MXU and measured
    ~0.5 ms/level on a v5e; this form is bandwidth-bound and fuses.
    """
    k = gaussian_kernel_1d(ksize, sigma)
    r = ksize // 2
    h, w = img.shape
    # reflect-101 padding (edge pixel not duplicated)
    padded = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    tmp = sum(float(k[i]) * padded[:, i:i + w] for i in range(ksize))
    return sum(float(k[i]) * tmp[i:i + h, :] for i in range(ksize))
