"""Viewer subsystem tests: PNG codec, overlays, scene render, web server.

Reference parity targets: image_viewer.cpp:27-58 (observation overlay),
depth_image_viewer.cpp:9-44 (HOT depth), pointcloud_viewer.cpp (scene),
parameters_viewer.cpp:71-83 + slam_thread.hpp:43-45 (params/control).
"""

import json
import urllib.request

import numpy as np
import pytest

from modular_slam_tpu.viz.png import encode_png, read_png, write_png
from modular_slam_tpu.viz.overlay import (
    depth_colormap, draw_keypoints, draw_observations,
)
from modular_slam_tpu.viz.scene import (
    frustum_lines, pointcloud_from_rgbd, render_scene,
)


def test_png_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_gray16(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, (21, 17), dtype=np.uint16)
    p = str(tmp_path / "d.png")
    write_png(p, img)
    back = read_png(p)
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, img)


def test_png_reads_foreign_encoder(tmp_path):
    """Our reader must handle PNGs with non-zero filters (e.g. OpenCV's)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (31, 29, 3), dtype=np.uint8)
    p = str(tmp_path / "cv.png")
    cv2.imwrite(p, img[..., ::-1])  # cv2 writes BGR
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_depth_colormap_hot_ramp():
    depth = np.array([[0.0, 1.0, 2.0, 3.0]], np.float32)
    img = depth_colormap(depth, dmin=1.0, dmax=3.0)
    assert img.shape == (1, 4, 3)
    assert (img[0, 0] == 0).all()                 # invalid -> black
    assert img[0, 1, 0] == 0                      # min -> black end of ramp
    assert (img[0, 3] == 255).all()               # max -> white
    # mid: red saturated before green before blue (HOT ordering)
    assert img[0, 2, 0] >= img[0, 2, 1] >= img[0, 2, 2]


def test_draw_observations_colors():
    rgb = np.zeros((32, 32, 3), np.uint8)
    kp = np.array([[8.0, 8.0]], np.float32)
    lm = np.array([[24.0, 24.0]], np.float32)
    out = draw_observations(rgb, kp, lm, np.array([True]))
    assert out[8, 8, 0] > 150 and out[8, 8, 2] < 100      # red keypoint
    assert out[24, 24, 2] > 150                            # blue landmark
    assert out[16, 16, 1] > 150                            # green line midpoint
    # invalid rows draw nothing
    out2 = draw_observations(rgb, kp, lm, np.array([False]))
    assert (out2 == 0).all()


def test_draw_clipping_is_safe():
    rgb = np.zeros((16, 16, 3), np.uint8)
    kp = np.array([[-5.0, 3.0]], np.float32)
    lm = np.array([[30.0, 30.0]], np.float32)
    draw_observations(rgb, kp, lm, np.array([True]))  # no raise
    draw_keypoints(rgb, np.array([[100.0, -7.0]], np.float32),
                   np.array([True]))


def test_pointcloud_from_rgbd_geometry():
    from modular_slam_tpu.config import CameraConfig

    cam = CameraConfig(fx=50.0, fy=50.0, cx=15.5, cy=11.5,
                       width=32, height=24)
    depth = np.full((24, 32), 2.0, np.float32)
    rgb = np.full((24, 32, 3), 128, np.uint8)
    pts, cols = pointcloud_from_rgbd(rgb, depth, cam, stride=1)
    assert pts.shape == (24 * 32, 3)
    assert np.allclose(pts[:, 2], 2.0)
    # center pixel backprojects near the optical axis
    center = pts[np.argmin(np.abs(pts[:, 0]) + np.abs(pts[:, 1]))]
    assert abs(center[0]) < 0.05 and abs(center[1]) < 0.05
    # identity-pose translation offset applies
    pts2, _ = pointcloud_from_rgbd(
        rgb, depth, cam, np.array([1.0, 0, 0, 0]), np.array([1.0, 2.0, 3.0]),
        stride=1)
    np.testing.assert_allclose(pts2, pts + np.array([1, 2, 3]), atol=1e-5)


def test_frustum_lines_shape():
    from modular_slam_tpu.config import CameraConfig

    cam = CameraConfig(fx=50.0, fy=50.0, cx=15.5, cy=11.5,
                       width=32, height=24)
    segs = frustum_lines(np.array([1.0, 0, 0, 0]), np.zeros(3), cam, 0.2)
    assert segs.shape == (8, 2, 3)
    # apex at the camera center
    assert np.allclose(segs[0, 0], 0.0)
    # image-plane corners at z == scale
    assert np.allclose(segs[4:, :, 2], 0.2)


def test_overlay_fn_on_tracked_frames():
    """End-to-end: run 2 synthetic frames, compute the overlay pairs."""
    from modular_slam_tpu.config import (
        CameraConfig, DetectorConfig, MapConfig, PnpConfig, SlamConfig,
    )
    from modular_slam_tpu.engine import SlamSystem
    from modular_slam_tpu.eval.synthetic import PlaneSceneGenerator
    from modular_slam_tpu.viz.overlay import make_overlay_fn

    cfg = SlamConfig(
        camera=CameraConfig(fx=320.0, fy=320.0, cx=159.5, cy=119.5,
                            width=320, height=240),
        detector=DetectorConfig(n_levels=4, max_keypoints=384),
        map=MapConfig(max_keyframes=32, max_landmarks=4096,
                      max_observations=16384),
        pnp=PnpConfig(n_hypotheses=64),
    )
    gen = PlaneSceneGenerator(cfg.camera, seed=1)
    poses = gen.trajectory(2, step_t=(0.02, 0.0, 0.0))
    system = SlamSystem(cfg, enable_backend=False)
    frames = list(gen.sequence(poses))
    for rgb, depth, ts in frames:
        system.process(rgb, depth, ts)

    od = make_overlay_fn(cfg)(system.arena, system.state,
                              system.last_features)
    n = int(np.asarray(od.valid).sum())
    assert n >= 5  # tracked frame matches several landmarks
    kp = np.asarray(od.kp_uv)[np.asarray(od.valid)]
    lm = np.asarray(od.lm_uv)[np.asarray(od.valid)]
    # matched projections land near their keypoints on an easy scene
    med = np.median(np.linalg.norm(kp - lm, axis=1))
    assert med < 5.0

    over = draw_observations(frames[-1][0], np.asarray(od.kp_uv),
                             np.asarray(od.lm_uv), np.asarray(od.valid))
    assert over.shape == frames[-1][0].shape
    assert (over != frames[-1][0]).any()


def test_render_scene_writes_png(tmp_path):
    from modular_slam_tpu.config import MapConfig, CameraConfig
    from modular_slam_tpu.map.arena import empty_arena

    arena = empty_arena(MapConfig(max_keyframes=4, max_landmarks=64,
                                  max_observations=128))
    cam = CameraConfig(fx=50.0, fy=50.0, cx=15.5, cy=11.5,
                       width=32, height=24)
    traj = np.array([[0, 0, 0], [0.1, 0, 0]], np.float32)
    p = str(tmp_path / "scene.png")
    render_scene(p, arena, traj, cam=cam)
    head = open(p, "rb").read(8)
    assert head == b"\x89PNG\r\n\x1a\n"


def test_viewer_server_endpoints():
    from modular_slam_tpu.utils.params import ParameterRegistry
    from modular_slam_tpu.viz.server import ViewerServer

    srv = ViewerServer(port=0).start()
    try:
        params = ParameterRegistry()
        params.register_number("min_matched_points", 10, 0, 100)
        srv.state.params = params
        srv.state.publish_stats({"keyframes": 3, "fps": 12.5})
        srv.state.publish_frame(np.zeros((8, 8, 3), np.uint8))

        def get(path):
            with urllib.request.urlopen(srv.url.rstrip("/") + path) as r:
                return r.status, r.read()

        st, body = get("/")
        assert st == 200 and b"viewer" in body
        st, body = get("/stats.json")
        assert st == 200 and json.loads(body)["keyframes"] == 3
        st, body = get("/frame.png")
        assert st == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        st, body = get("/params")
        ps = json.loads(body)
        assert ps[0]["name"] == "min_matched_points" and ps[0]["value"] == 10

        # write-back applies (the reference's setValue stub did not)
        req = urllib.request.Request(
            srv.url.rstrip("/") + "/params", method="POST",
            data=json.dumps({"name": "min_matched_points",
                             "value": 25}).encode())
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        assert params.get("min_matched_points") == 25

        # out-of-range rejected
        req = urllib.request.Request(
            srv.url.rstrip("/") + "/params", method="POST",
            data=json.dumps({"name": "min_matched_points",
                             "value": 1000}).encode())
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 422
        assert raised
        assert params.get("min_matched_points") == 25

        # pause / resume / stop atomics
        req = urllib.request.Request(
            srv.url.rstrip("/") + "/control", method="POST",
            data=json.dumps({"action": "pause"}).encode())
        urllib.request.urlopen(req)
        assert srv.state.paused.is_set()
        req = urllib.request.Request(
            srv.url.rstrip("/") + "/control", method="POST",
            data=json.dumps({"action": "stop"}).encode())
        urllib.request.urlopen(req)
        assert srv.state.stopped.is_set()
        assert not srv.state.wait_if_paused()
    finally:
        srv.stop()
