"""Relocalization after tracking loss.

The reference's IRelocalizer is a stub returning nothing
(orb_relocalizer.cpp:32-36), so tracking loss just logs and drifts
(rgbd_feature_frontend.cpp:495-534).  Here: BoW query over the keyframe
database -> geometric verification against the best candidates ->
recovered pose, all jittable.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from modular_slam_tpu.config import SlamConfig
from modular_slam_tpu.geometry.camera import camera_from_config
from modular_slam_tpu.geometry.se3 import Pose, identity_pose
from modular_slam_tpu.loop.detector import (
    LoopDatabase,
    geometric_verify,
    query_candidates,
)
from modular_slam_tpu.loop.vocab import bow_histogram, load_trained_vocab
from modular_slam_tpu.map.arena import MapArena
from modular_slam_tpu.types import Features

Array = jnp.ndarray


def make_relocalizer(cfg: SlamConfig, vocab=None) -> Callable:
    """Returns jitted fn(arena, db, feats, key) ->
    (ok, pose, kf_slot, n_inliers): try the top-k BoW candidates in
    order, accept the first that verifies geometrically.

    `vocab` overrides the packaged codebook — it MUST be the same
    codebook the database histograms were built with (checkpoint resume
    restores the saved vocab for exactly this reason)."""
    cam = camera_from_config(cfg.camera)
    if vocab is None:
        vocab = load_trained_vocab(cfg.loop.vocab_size)

    def relocalize(arena: MapArena, db: LoopDatabase, feats: Features,
                   key: Array):
        hist = bow_histogram(
            feats.descriptors.unpacked, feats.keypoints.valid, vocab
        )
        # no temporal mask for relocalization: any keyframe may rescue us
        scores, slots = query_candidates(
            db, hist, jnp.int32(-10_000), min_gap=0,
            top_k=cfg.loop.top_k,
        )

        def try_candidate(carry, sk):
            ok_so_far, pose_q, pose_t, best_slot, best_inl, key = carry
            score, slot = sk
            key, sub = jax.random.split(key)
            ok, n_inl, pose = geometric_verify(
                arena, slot, feats, cam, cfg, sub
            )
            use = (~ok_so_far) & ok & (score > 0.0)
            return (
                ok_so_far | use,
                jnp.where(use, pose.q, pose_q),
                jnp.where(use, pose.t, pose_t),
                jnp.where(use, slot, best_slot),
                jnp.where(use, n_inl, best_inl),
                key,
            ), None

        init = (jnp.array(False), identity_pose().q, identity_pose().t,
                jnp.int32(-1), jnp.int32(0), key)
        (ok, q, t, slot, n_inl, _), _ = lax.scan(
            try_candidate, init, (scores, slots)
        )
        return ok, Pose(q=q, t=t), slot, n_inl

    return jax.jit(relocalize)
