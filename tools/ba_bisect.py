"""Bisect the dense local-BA iteration cost on the real device: time each
piece of lm_step in isolation with scan probes (residuals, normal-eq
assembly einsums, the [6K,6K] reduced solve, cost eval) so optimization
targets the real bottleneck."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from modular_slam_tpu.utils import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("device:", jax.devices()[0], file=sys.stderr)

K, L, d = 16, 4096, 3
O = L * K
rng = np.random.default_rng(0)


def probe(body, xs_n, label, n=16):
    keys = jax.random.split(jax.random.PRNGKey(0), xs_n)

    @jax.jit
    def run(keys):
        def b(c, k):
            return c + body(k), 0
        return lax.scan(b, jnp.float32(0), keys)[0]

    jax.block_until_ready(run(keys))
    t0 = time.perf_counter()
    jax.block_until_ready(run(keys))
    print(f"{label:34s} {(time.perf_counter() - t0) / xs_n * 1e3:8.3f} ms")


# shared random tensors (closed over; vary per step via key-mixed scale)
r = jnp.asarray(rng.normal(size=(L, K, d)).astype(np.float32))
Jp = jnp.asarray(rng.normal(size=(L, K, d, 6)).astype(np.float32))
Jl = jnp.asarray(rng.normal(size=(L, K, d, 3)).astype(np.float32))
w = jnp.asarray((rng.random((L, K)) < 0.05).astype(np.float32))
S0 = jnp.asarray(rng.normal(size=(K * 6, K * 6)).astype(np.float32))
S0 = S0 @ S0.T + 10.0 * jnp.eye(K * 6)
rhs0 = jnp.asarray(rng.normal(size=(K * 6,)).astype(np.float32))


def mix(key):
    return 1.0 + 1e-6 * jax.random.uniform(key)


probe(lambda k: jnp.sum(jnp.einsum(
    "lkdi,lkdj->kij", Jp * (w * mix(k))[..., None, None], Jp)),
    64, "U einsum [L,K,d,6]^2 -> [K,6,6]")
probe(lambda k: jnp.sum(jnp.einsum(
    "lkdi,lkdj->lij", Jl * (w * mix(k))[..., None, None], Jl)),
    64, "V einsum -> [L,3,3]")
probe(lambda k: jnp.sum(jnp.einsum(
    "lkdi,lkdj->klij", Jp * (w * mix(k))[..., None, None], Jl)),
    64, "W einsum -> [K,L,6,3]")

W = jnp.asarray(rng.normal(size=(K, L, 6, 3)).astype(np.float32))
Vinv = jnp.asarray(rng.normal(size=(L, 3, 3)).astype(np.float32))
probe(lambda k: jnp.sum(jnp.einsum(
    "klim,lmn->klin", W * mix(k), Vinv)), 64, "WVi einsum [K,L,6,3]")
WVi = jnp.asarray(rng.normal(size=(K, L, 6, 3)).astype(np.float32))
probe(lambda k: jnp.sum(jnp.einsum(
    "alin,bljn->aibj", WVi * mix(k), W)), 64, "S einsum -> [K,6,K,6]")

probe(lambda k: jnp.sum(jnp.linalg.solve(S0 * mix(k), rhs0)),
      64, "linalg.solve 96x96 (LU)")
probe(lambda k: jnp.sum(jax.scipy.linalg.cho_solve(
    (jnp.linalg.cholesky(S0 * mix(k)), True), rhs0)),
      64, "cholesky + cho_solve 96x96")


def cg_dense(S, b, iters=24):
    x = jnp.zeros_like(b)
    r = b
    p = r
    rz = jnp.vdot(r, r)

    def body(c, _):
        x, r, p, rz = c
        Ap = S @ p
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rz2 = jnp.vdot(r, r)
        p = r + (rz2 / rz) * p
        return (x, r, p, rz2), 0

    (x, *_), _ = lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


probe(lambda k: jnp.sum(cg_dense(S0 * mix(k), rhs0)),
      64, "dense CG(24) 96x96 (matmul only)")

# residual-eval scale check: [L*K] point2point
from modular_slam_tpu.backend.residuals import ObsData, point2point_residuals
from modular_slam_tpu.geometry.se3 import quat_to_matrix

obs_d = ObsData(
    kf=jnp.tile(jnp.arange(K, dtype=jnp.int32), L),
    lm=jnp.repeat(jnp.arange(L, dtype=jnp.int32), K),
    p_obs=jnp.asarray(rng.normal(size=(O, 3)).astype(np.float32)),
    uv=jnp.zeros((O, 2), jnp.float32),
    w=w.reshape(-1),
)
q = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (K, 1))
t = jnp.asarray(rng.normal(size=(K, 3)).astype(np.float32))
lm = jnp.asarray(rng.normal(size=(L, 3)).astype(np.float32))
probe(lambda k: sum(jnp.sum(x) for x in point2point_residuals(
    quat_to_matrix(q), t * mix(k), lm, obs_d)),
    64, "p2p residuals+jacobians [L*K]")

# while_loop overhead: trivial body
probe(lambda k: lax.while_loop(
    lambda c: c[0] < 10,
    lambda c: (c[0] + 1, c[1] * 1.000001 + mix(k) * 0),
    (jnp.int32(0), jnp.float32(1.0)))[1],
    64, "while_loop 10 trivial iters")
