"""End-to-end pipeline tests on synthetic sequences (CPU).

These mirror the reference's only verification mode — full-sequence runs
with trajectory evaluation (SURVEY.md §4) — shrunk to CPU-friendly sizes.
"""
import numpy as np
import pytest

from orbslam2_tpu.config import SlamConfig, Sensor, with_camera
from orbslam2_tpu.io import synth
from orbslam2_tpu.system import System
from orbslam2_tpu.tracking import TrackState
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers


def make_cfg(scene, sensor=Sensor.MONOCULAR, **kw):
    return with_camera(
        SlamConfig(sensor=sensor, **kw),
        fx=float(scene.K[0, 0]), fy=float(scene.K[1, 1]),
        cx=float(scene.K[0, 2]), cy=float(scene.K[1, 2]),
        width=scene.width, height=scene.height)


@pytest.mark.slow
class TestMonoE2E:
    def test_tracks_and_bounded_ate(self):
        N = 30
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        slam = System(make_cfg(scene))
        for i in range(N):
            slam.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        assert slam.tracking_state == TrackState.OK
        ts, est = slam.tracker.trajectory()
        assert len(est) >= N - 8
        fids = np.round(np.asarray(ts) * 30).astype(int)
        ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]))
        assert np.isfinite(ate)
        # reference-grade gate: template-refined measurements + the SO(3)
        # orthonormalization and robust-cost LM fixes brought this from
        # ~12 cm to ~1.1 cm; the gate enforces no regression past 2 cm
        assert ate < 0.02, f"ATE {ate*100:.1f} cm"
        stats = slam.map_stats()
        assert stats["keyframes"] >= 3 and stats["points"] > 300

    def test_relocalization_after_blackout(self):
        N = 24
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        slam = System(make_cfg(scene))
        for i in range(N):
            slam.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        assert slam.tracking_state == TrackState.OK
        # blackout: featureless frames -> LOST
        blank = np.full((scene.height, scene.width), 128.0, np.float32)
        for j in range(3):
            slam.track_monocular(blank, (N + j) / 30.0)
        assert slam.tracking_state == TrackState.LOST
        # return to a well-mapped early viewpoint -> relocalize (frame 8 is
        # covered by the strongest keyframes; late-trajectory keyframes can
        # be point-starved on this synthetic sequence)
        revisit = 8
        ok = False
        for j in range(4):
            pose = slam.track_monocular(
                synth.render_room(scene, gt[revisit], seed=999 + j),
                (N + 3 + j) / 30.0)
            if pose is not None:
                ok = True
                break
        assert ok, "failed to relocalize"
        # recovered pose close to the revisited ground-truth pose (up to map
        # scale; compare viewing direction)
        z_est = pose[2, :3]
        z_gt = gt[revisit][2, :3]
        assert z_est @ z_gt > 0.99

    def test_trajectory_save_formats(self, tmp_path):
        N = 14
        scene = synth.make_room(seed=1)
        gt = synth.orbit_trajectory(N)
        slam = System(make_cfg(scene))
        for i in range(N):
            slam.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        tum = tmp_path / "traj.txt"
        kitti = tmp_path / "traj_kitti.txt"
        kf = tmp_path / "kf.txt"
        slam.save_trajectory_tum(tum)
        slam.save_trajectory_kitti(kitti)
        slam.save_keyframe_trajectory_tum(kf)
        t = np.loadtxt(tum)
        assert t.shape[1] == 8
        k = np.loadtxt(kitti)
        assert k.shape[1] == 12
        # quaternions normalized
        np.testing.assert_allclose(np.linalg.norm(t[:, 4:8], axis=1), 1.0,
                                   atol=1e-5)


@pytest.mark.slow
class TestRGBDE2E:
    def test_rgbd_tracks_metric_scale(self):
        # N stops before the trajectory's final grazing-angle segment (the
        # camera ends up viewing the right wall at >60 deg obliquity, where
        # foreshortened texture breaks descriptor matching for all sensors —
        # known weakness, README "Known issues")
        N = 17
        scene = synth.make_room(seed=2)
        gt = synth.orbit_trajectory(N)
        # sensor scaled to the scene: bf=250 (0.5m baseline) so depth
        # measurements constrain the 4.5-8m room, ThDepth=25 -> 12.5m close
        # range (the reference's KITTI config is analogous: bf=386,
        # ThDepth=35 -> 27m)
        cfg = make_cfg(scene, sensor=Sensor.RGBD, th_depth=25.0)
        from dataclasses import replace
        cfg = replace(cfg, camera=replace(cfg.camera, bf=250.0))
        slam = System(cfg)

        def depth_map(T):
            return synth.depth_room(scene, T)

        tracked = 0
        for i in range(N):
            img = synth.render_room(scene, gt[i], seed=i)
            pose = slam.track_rgbd(img, depth_map(gt[i]), i / 30.0)
            if pose is not None:
                tracked += 1
        assert tracked >= N - 3, tracked
        ts, est = slam.tracker.trajectory()
        fids = np.round(np.asarray(ts) * 30).astype(int)
        # metric scale: evaluate WITHOUT scale alignment
        ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]),
                       with_scale=False)
        # reference-grade gate (was 0.30 m while the det(R) scale-drift
        # runaway was undiagnosed; measured 0.4 cm after the fixes)
        assert ate < 0.03, f"metric ATE {ate*100:.1f} cm"


@pytest.mark.slow
class TestAsyncMapping:
    def test_async_pipeline_tracks(self):
        """The bounded-queue async mapping stage (the reference's
        InsertKeyFrame thread handoff) must track equivalently."""
        import time
        N = 14
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        slam = System(make_cfg(scene), async_mapping=True)
        for i in range(N):
            slam.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
        time.sleep(2)
        slam.shutdown()
        stats = slam.map_stats()
        assert stats["state"] == "OK"
        assert stats["keyframes"] >= 3 and stats["points"] > 300


@pytest.mark.slow
class TestPipelinedSequence:
    def test_run_sequence_matches_sequential(self):
        N = 14
        scene = synth.make_room(seed=0)
        gt = synth.orbit_trajectory(N)
        imgs = [synth.render_room(scene, gt[i], seed=i) for i in range(N)]
        slam = System(make_cfg(scene))
        tracked = slam.run_sequence(
            ((i / 30.0, {"image": imgs[i]}) for i in range(N)))
        assert tracked >= N - 5
        assert slam.tracking_state == TrackState.OK
        assert slam.map.n_points > 300
