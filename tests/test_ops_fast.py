"""FAST score / NMS / blur / pyramid golden tests vs OpenCV + numpy oracles."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from modular_slam_tpu.ops.fast import fast_score, nms3x3, border_mask, FAST_CIRCLE
from modular_slam_tpu.ops.blur import gaussian_blur
from modular_slam_tpu.ops.pyramid import build_pyramid, pyramid_shapes
from modular_slam_tpu.config import DetectorConfig

RNG = np.random.default_rng(7)


def _rand_img(h=64, w=80):
    img = RNG.integers(0, 256, size=(h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (5, 5), 1.0)  # correlated, image-like


def test_circle_offsets_are_radius3_ring():
    assert len(FAST_CIRCLE) == 16
    assert len(set(FAST_CIRCLE)) == 16
    for dy, dx in FAST_CIRCLE:
        assert max(abs(dy), abs(dx)) == 3 or (abs(dy), abs(dx)) in {(2, 2)}
    # circular adjacency: consecutive offsets are neighbors
    for k in range(16):
        dy0, dx0 = FAST_CIRCLE[k]
        dy1, dx1 = FAST_CIRCLE[(k + 1) % 16]
        assert abs(dy1 - dy0) <= 1 and abs(dx1 - dx0) <= 1


def _fast_oracle_corners(img_u8, threshold):
    fast = cv2.FastFeatureDetector_create(
        threshold=threshold, nonmaxSuppression=False,
        type=cv2.FastFeatureDetector_TYPE_9_16)
    kps = fast.detect(img_u8, None)
    return {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}


@pytest.mark.parametrize("threshold", [10, 20, 40])
def test_fast_score_matches_opencv_corner_set(threshold):
    img = RNG.integers(0, 256, size=(96, 128)).astype(np.uint8)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    score = np.array(fast_score(jnp.asarray(img.astype(np.float32))))
    ours = set(zip(*np.where(score > threshold)))
    # compare interior only (our rolls wrap at edges)
    oracle = _fast_oracle_corners(img, threshold)
    interior = lambda s: {(y, x) for (y, x) in s
                          if 3 <= y < 93 and 3 <= x < 125}
    ours_i, oracle_i = interior(ours), interior(oracle)
    assert ours_i == oracle_i, (
        f"thr={threshold}: ours-only={sorted(ours_i - oracle_i)[:5]} "
        f"oracle-only={sorted(oracle_i - ours_i)[:5]}"
    )


def test_fast_score_is_max_threshold():
    """score s means: corner for all t < s, not a corner for t >= s."""
    img = RNG.integers(0, 256, size=(64, 64)).astype(np.uint8)
    score = np.array(fast_score(jnp.asarray(img.astype(np.float32))))
    score *= np.array(border_mask(64, 64, 4))  # rolls wrap at edges
    y, x = np.unravel_index(score.argmax(), score.shape)
    s = score[y, x]
    assert s > 0
    for thr, expect in [(int(s) - 1, True), (int(np.ceil(s)), False)]:
        oracle = _fast_oracle_corners(img, thr)
        assert ((y, x) in oracle) == expect


def test_nms_keeps_local_maxima():
    s = np.zeros((16, 16), np.float32)
    s[5, 5] = 10.0
    s[5, 6] = 8.0   # suppressed by 10 next door
    s[10, 10] = 7.0
    out = np.array(nms3x3(jnp.asarray(s)))
    assert out[5, 5] == 10.0 and out[10, 10] == 7.0 and out[5, 6] == 0.0


def test_border_mask():
    m = np.array(border_mask(10, 12, 3))
    assert m.sum() == 4 * 6
    assert m[3, 3] == 1 and m[2, 3] == 0 and m[6, 8] == 1 and m[7, 8] == 0


def test_gaussian_blur_matches_opencv():
    img = _rand_img()
    ours = np.array(gaussian_blur(jnp.asarray(img), 7, 2.0))
    ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_pyramid_shapes_and_content():
    cfg = DetectorConfig()
    img = _rand_img(480, 640)
    levels = build_pyramid(jnp.asarray(img), cfg)
    shapes = pyramid_shapes(480, 640, cfg)
    assert len(levels) == 8
    for lvl, (h, w) in zip(levels, shapes):
        assert lvl.shape == (h, w)
    assert shapes[1] == (400, 533)
    # downscaled content should correlate strongly with cv2 resize
    ref = cv2.resize(img, (533, 400), interpolation=cv2.INTER_LINEAR)
    ours = np.array(levels[1])
    cc = np.corrcoef(ref.ravel(), ours.ravel())[0, 1]
    assert cc > 0.99
