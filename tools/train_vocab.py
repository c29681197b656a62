"""Train + calibrate the BoW vocabulary on real descriptor statistics.

The round-1 codebook was a random ±1 projection validated only on
i.i.d. random bits; real BRIEF descriptors are highly non-uniform.  This
tool (VERDICT r1 item 6):

1. harvests BRIEF descriptors from rendered synthetic scenes (several
   textures / viewpoints) AND any real TUM-format frames available
   (data/sample, /root/reference/data when mounted);
2. trains a spherical-k-means codebook (loop/vocab.py::train_vocab) and
   writes it to modular_slam_tpu/data/vocab_<V>_<bits>.npz (shipped as
   package data, loaded by loop/vocab.py::load_trained_vocab);
3. sweeps the BoW score threshold over same-place / different-place
   keyframe pairs from held-out rendered revisits and reports
   precision/recall per threshold -> the LoopConfig.min_score operating
   point.

Run: python tools/train_vocab.py [--vocab-size 1024] [--out ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def harvest_descriptors(cfg, n_scenes: int = 6, frames_per_scene: int = 6):
    """-> [N, 256] ±1 int8 from rendered scenes + on-disk sample frames."""
    import jax
    import jax.numpy as jnp

    from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
    from modular_slam_tpu.ops.detector import detect

    f_det = jax.jit(lambda g, d: detect(g, d, cfg.detector))
    w = np.array([0.299, 0.587, 0.114], np.float32)
    out = []

    def collect(gray, depth):
        feats = f_det(jnp.asarray(gray), jnp.asarray(depth))
        valid = np.asarray(feats.keypoints.valid)
        out.append(np.asarray(feats.descriptors.unpacked)[valid])

    for s in range(n_scenes):
        gen = PlaneSceneGenerator(cfg.camera, seed=1000 + s,
                                  texture_ppm=200.0 + 60.0 * s)
        poses = gen.trajectory(frames_per_scene,
                               step_t=(0.08, 0.03 * (s % 3 - 1), 0.01),
                               step_rot=(0.002, 0.004, 0.002))
        for rgb, depth, _ in gen.sequence(poses):
            collect(rgb.astype(np.float32) @ w, depth)

    # real frames, when available (reference 2-frame sample + bundled set)
    for root in ("/root/reference/data", "data/sample"):
        if not os.path.isdir(root):
            continue
        try:
            from modular_slam_tpu.io.tum import TumRgbdDataset

            ds = TumRgbdDataset(root)
            for i, (rgb, depth, _) in enumerate(ds):
                if i >= 8:
                    break
                collect(rgb.astype(np.float32) @ w, depth)
            print(f"harvested from {root}", file=sys.stderr)
        except Exception as e:  # pragma: no cover - optional data
            print(f"skipping {root}: {e}", file=sys.stderr)

    desc = np.concatenate(out)
    print(f"harvested {len(desc)} descriptors", file=sys.stderr)
    return desc


def revisit_pairs(cfg, vocab, n_scenes: int = 4, n_spots: int = 6,
                  scene: str = "plane"):
    """BoW scores for same-place and different-place keyframe pairs from
    held-out rendered scenes (plane or box world).  Same place =
    identical spot revisited with small pose jitter (the loop-closure
    situation); different = other spots in the same scene."""
    import jax
    import jax.numpy as jnp

    from modular_slam_tpu.eval.synthetic import (BoxSceneGenerator,
                                                 PlaneSceneGenerator)
    from modular_slam_tpu.geometry.se3 import Pose
    from modular_slam_tpu.loop.vocab import bow_histogram
    from modular_slam_tpu.ops.detector import detect

    f_det = jax.jit(lambda g, d: detect(g, d, cfg.detector))
    f_bow = jax.jit(lambda d, v: bow_histogram(d, v, jnp.asarray(vocab)))
    w = np.array([0.299, 0.587, 0.114], np.float32)

    same, diff = [], []
    for s in range(n_scenes):
        if scene == "box":
            gen = BoxSceneGenerator(cfg.camera, seed=2000 + s)
        else:
            gen = PlaneSceneGenerator(cfg.camera, seed=2000 + s,
                                      texture_ppm=250.0)
        hists = []
        for k in range(n_spots):
            # box wall spans x in [-5, 5]; boxes in [-2.2, 2.2]
            span = 0.8 if scene == "box" else 0.45
            spot = np.array([span * k - span * n_spots / 2,
                             0.15 * (k % 2), 0.0], np.float32)
            hs = []
            for jit_i in range(2):  # visit + revisit with pose jitter
                rng = np.random.default_rng(31 * k + jit_i + 7 * s)
                t = spot + rng.normal(0, 0.02, 3).astype(np.float32)
                rgb, depth = gen.render(
                    Pose(q=jnp.asarray([1.0, 0, 0, 0]), t=jnp.asarray(t)))
                feats = f_det(jnp.asarray(rgb.astype(np.float32) @ w),
                              jnp.asarray(depth))
                hs.append(np.asarray(f_bow(feats.descriptors.unpacked,
                                           feats.keypoints.valid)))
            hists.append(hs)
        for k in range(n_spots):
            same.append(float(np.dot(hists[k][0], hists[k][1])))
            for k2 in range(k + 1, n_spots):
                diff.append(float(np.dot(hists[k][0], hists[k2][0])))
    return np.array(same), np.array(diff)


def sweep(same: np.ndarray, diff: np.ndarray):
    rows = []
    for thr in np.arange(0.05, 0.95, 0.05):
        tp = float((same >= thr).mean())
        fp = float((diff >= thr).mean())
        prec = tp / max(tp + fp, 1e-9)
        rows.append((round(float(thr), 2), round(tp, 3), round(fp, 3),
                     round(prec, 3)))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab-size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from modular_slam_tpu.config import SlamConfig
    from modular_slam_tpu.loop.vocab import make_vocab, train_vocab

    cfg = SlamConfig()
    desc = harvest_descriptors(cfg)
    vocab = train_vocab(desc, args.vocab_size, iters=args.iters)

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "modular_slam_tpu", "data",
        f"vocab_{args.vocab_size}_{vocab.shape[1]}.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, vocab=vocab)
    print(f"wrote {out}", file=sys.stderr)

    print("\n-- operating-point sweep (trained vocab, plane) --",
          file=sys.stderr)
    same, diff = revisit_pairs(cfg, vocab)
    print(f"same-place scores:  min {same.min():.3f} med "
          f"{np.median(same):.3f}", file=sys.stderr)
    print(f"diff-place scores:  med {np.median(diff):.3f} max "
          f"{diff.max():.3f}", file=sys.stderr)
    print("thr   recall  fp_rate  precision", file=sys.stderr)
    for thr, rec, fp, prec in sweep(same, diff):
        print(f"{thr:4.2f}  {rec:6.3f}  {fp:7.3f}  {prec:9.3f}",
              file=sys.stderr)

    print("\n-- operating-point sweep (trained vocab, BOX world) --",
          file=sys.stderr)
    same_b, diff_b = revisit_pairs(cfg, vocab, scene="box")
    print(f"same-place scores:  min {same_b.min():.3f} med "
          f"{np.median(same_b):.3f}", file=sys.stderr)
    print(f"diff-place scores:  med {np.median(diff_b):.3f} max "
          f"{diff_b.max():.3f}", file=sys.stderr)
    print("thr   recall  fp_rate  precision", file=sys.stderr)
    for thr, rec, fp, prec in sweep(same_b, diff_b):
        print(f"{thr:4.2f}  {rec:6.3f}  {fp:7.3f}  {prec:9.3f}",
              file=sys.stderr)

    print("\n-- random-projection vocab (round-1 baseline) --",
          file=sys.stderr)
    same_r, diff_r = revisit_pairs(cfg, make_vocab(args.vocab_size))
    print(f"same med {np.median(same_r):.3f}  diff med "
          f"{np.median(diff_r):.3f}  separation "
          f"{np.median(same_r) - np.median(diff_r):.3f} "
          f"(trained: {np.median(same) - np.median(diff):.3f})",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
