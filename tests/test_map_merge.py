"""Multi-session map merging e2e (BASELINE configs item 5)."""
import numpy as np
import pytest

from orbslam2_tpu.io import synth
from orbslam2_tpu.map_merge import merge_maps
from orbslam2_tpu.system import System
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers

from test_slam_e2e import make_cfg


@pytest.mark.slow
class TestMapMerge:
    def test_two_sessions_merge(self):
        """Run two overlapping halves of a trajectory as separate sessions,
        merge session B's map into A, check the merged keyframe set covers
        both halves in one consistent frame."""
        N = 26
        scene = synth.make_room(seed=5)
        gt = synth.orbit_trajectory(N)
        # session A: frames 0..15, session B: frames 10..25 (overlap 10..15)
        sys_a = System(make_cfg(scene))
        for i in range(0, 16):
            sys_a.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        sys_b = System(make_cfg(scene))
        for i in range(10, N):
            sys_b.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        assert sys_a.map.n_keyframes >= 2 and sys_b.map.n_keyframes >= 2
        n_a = sys_a.map.n_keyframes
        n_b = sys_b.map.n_keyframes

        ok = merge_maps(sys_a, sys_b.map)
        assert ok, "cross-map alignment not found"
        assert sys_a.map.n_keyframes == n_a + n_b

        # merged keyframe trajectory must be consistent with ground truth
        # across BOTH halves (Sim3-aligned, mono scale)
        mp = sys_a.map
        ids = mp.kf_ids
        ts = mp.kf_timestamp[ids]
        fids = np.round(ts * 30).astype(int)
        est = mp.kf_pose[ids]
        ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]))
        assert np.isfinite(ate)
        assert ate < 0.6, f"merged-map KF ATE {ate*100:.1f} cm"
        # both halves represented (B's last keyframe may precede its last
        # tracked frame)
        assert fids.min() <= 5 and fids.max() >= 17
