"""Preconditioned conjugate gradient, matrix-free, fixed iteration count.

Used to solve the Schur-complement reduced camera system S x = b without
materializing S: the caller provides `matvec` (two segment-sum sweeps over
the observation list — shardable over devices with a psum) and a
block-Jacobi preconditioner.  Fixed `iters` keeps the computation static
for XLA; convergence is monitored via the returned residual norm.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def pcg(
    matvec: Callable[[Array], Array],
    b: Array,
    precond: Callable[[Array], Array],
    iters: int,
    x0: Array | None = None,
    dot: Callable[[Array, Array], Array] = jnp.vdot,
) -> Tuple[Array, Array]:
    """Solve A x = b.  Returns (x, final residual norm).

    `dot` is the inner product — when x/b are DEVICE-LOCAL BLOCKS of a
    sharded vector (parallel/kf_sharded_ba.py), pass a psum-reduced dot
    so the CG scalars are globally consistent across shards."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r)
    p = z
    rz = dot(r, z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        pAp = dot(p, Ap)
        alpha = jnp.where(jnp.abs(pAp) > 1e-20, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, r, _, _), _ = lax.scan(body, (x, r, p, rz), None, length=iters)
    return x, jnp.sqrt(dot(r, r))
