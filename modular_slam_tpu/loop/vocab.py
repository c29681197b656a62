"""Bag-of-binary-words vocabulary as batched matmul.

Replaces DBoW3 (the reference's OrbRelocalizer loads an external
`orbvoc.dbow3` vocabulary file that is not even shipped,
orb_relocalizer.cpp:28, and stubs every method :32-55).

TPU-native design: the vocabulary is a fixed ±1 projection codebook
[V, 256]; a descriptor's word is the argmax similarity (one int8 matmul
on the MXU), a frame's BoW vector is the L2-normalized word histogram,
and database scoring is hist @ database.T — batched matmul + top-k, no
trees, no pointer chasing.  The codebook is deterministic (seeded) so
every run shares the same vocabulary without external files.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray

_SEED = 0xB0BA


def make_vocab(vocab_size: int = 1024, n_bits: int = 256,
               seed: int = _SEED) -> np.ndarray:
    """[V, n_bits] ±1 int8 codebook (host constant, bake into jit)."""
    rng = np.random.default_rng(seed)
    return rng.choice(np.array([-1, 1], np.int8), size=(vocab_size, n_bits))


def descriptor_words(desc_pm1: Array, vocab: Array) -> Array:
    """[N, 256] ±1 -> [N] int32 word ids (argmax codebook similarity)."""
    sim = jnp.matmul(desc_pm1.astype(jnp.int32),
                     jnp.asarray(vocab).astype(jnp.int32).T,
                     preferred_element_type=jnp.int32)
    return jnp.argmax(sim, axis=1).astype(jnp.int32)


def bow_histogram(desc_pm1: Array, valid: Array, vocab: Array) -> Array:
    """[N, 256] ±1 + [N] mask -> [V] L2-normalized BoW vector."""
    V = vocab.shape[0]
    words = descriptor_words(desc_pm1, vocab)
    words = jnp.where(valid, words, V)  # invalid -> dropped bucket
    hist = jnp.zeros((V,), jnp.float32).at[words].add(1.0, mode="drop")
    n = jnp.linalg.norm(hist)
    return hist / jnp.maximum(n, 1e-6)
