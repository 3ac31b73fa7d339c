"""Live HTTP viewer (the reference's Pangolin Viewer thread equivalent,
src/Viewer.cpp): serves map/frame renders + menu toggles while tracking."""
import json
import time
import urllib.request

import numpy as np
import pytest

from orbslam2_tpu.io import synth
from orbslam2_tpu.system import System
from test_slam_e2e import make_cfg


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=30) as r:
        return r.status, r.read()


@pytest.mark.slow
def test_viewer_serves_and_toggles():
    N = 14
    scene = synth.make_room(seed=0)
    gt = synth.orbit_trajectory(N)
    slam = System(make_cfg(scene), use_viewer=True)
    port = slam.viewer.port
    try:
        for i in range(N):
            slam.track_monocular(synth.render_room(scene, gt[i], seed=i),
                                 i / 30.0)

        # give the render thread a beat to produce the first images
        deadline = time.time() + 30
        while time.time() < deadline:
            if slam.viewer._map_png and slam.viewer._frame_png:
                break
            time.sleep(0.25)

        st, body = _get(port, "/")
        assert st == 200 and b"orbslam2_tpu" in body
        st, body = _get(port, "/map.png")
        assert st == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        st, body = _get(port, "/frame.png")
        assert st == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        st, body = _get(port, "/stats.json")
        stats = json.loads(body)
        assert stats["keyframes"] >= 2 and stats["points"] > 50

        # menu toggles (src/Viewer.cpp:73-79): localization mode flips the
        # tracker; reset is deferred to the tracking thread
        _get(port, "/set?localization=1&points=0&graph=0&follow=0")
        assert slam.tracker.localization_only is True
        assert slam.viewer.show_points is False
        _get(port, "/set?localization=0")
        assert slam.tracker.localization_only is False

        _get(port, "/reset")
        assert slam._reset_pending is True
        # next frame applies the reset on the tracking thread
        slam.track_monocular(synth.render_room(scene, gt[0], seed=0), N / 30.0)
        assert slam._reset_pending is False
        assert slam.map.n_keyframes == 0  # fresh map, not yet re-initialized
    finally:
        slam.shutdown()
    assert slam.viewer is None  # shutdown stopped the viewer
