"""Stereo end-to-end test: exact rectified pair from the room scene."""
import numpy as np
import pytest

from orbslam2_tpu.config import Sensor
from orbslam2_tpu.io import synth
from orbslam2_tpu.system import System
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers

from test_slam_e2e import make_cfg


def right_pose(Tcw, baseline):
    """Right camera = left shifted +baseline along the camera x axis."""
    T = Tcw.copy()
    T[:, 3] = T[:, 3] - np.array([baseline, 0.0, 0.0], np.float32)
    return T


@pytest.mark.slow
class TestStereoE2E:
    def test_stereo_tracks_metric_scale(self):
        N = 16
        baseline = 0.5
        scene = synth.make_room(seed=4)
        gt = synth.orbit_trajectory(N)
        cfg = make_cfg(scene, sensor=Sensor.STEREO, th_depth=25.0)
        from dataclasses import replace
        cfg = replace(cfg, camera=replace(cfg.camera, bf=baseline * 500.0))
        slam = System(cfg)
        tracked = 0
        for i in range(N):
            left = synth.render_room(scene, gt[i], seed=i)
            right = synth.render_room(scene, right_pose(gt[i], baseline),
                                      seed=10_000 + i)
            pose = slam.track_stereo(left, right, i / 30.0)
            if pose is not None:
                tracked += 1
        assert tracked >= N - 3, tracked
        ts, est = slam.tracker.trajectory()
        fids = np.round(np.asarray(ts) * 30).astype(int)
        ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]),
                       with_scale=False)
        # reference-grade gate: sub-pixel keypoint disparity + template
        # refinement put this at ~1.2 cm metric; enforce no regression
        # past 3 cm (same bar as the RGB-D e2e)
        assert ate < 0.03, f"stereo metric ATE {ate*100:.1f} cm"
        assert slam.map.n_points > 300
