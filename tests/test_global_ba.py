"""Background, abortable global BA (global_ba.py) — the reference's
RunGlobalBundleAdjustment thread semantics (src/LoopClosing.cpp:726-905):
tracking keeps running during the solve, a second loop aborts it, and
keyframes/points created mid-solve are spanning-tree corrected."""
import threading
import time

import numpy as np
import pytest

from orbslam2_tpu.config import SlamConfig, Sensor
from orbslam2_tpu.global_ba import GlobalBA
from orbslam2_tpu.map.mapstate import MapState


def _build_map(cfg, n_kf=8, n_pts=200, seed=0, perturb=0.03):
    """Synthetic map: cameras on a line viewing a point cloud, all
    observations exact, poses+points perturbed away from ground truth."""
    rng = np.random.default_rng(seed)
    cam = cfg.camera
    mp = MapState(cfg, 256)
    pts_gt = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
                       rng.uniform(5, 9, n_pts)], -1).astype(np.float32)
    poses_gt = []
    for i in range(n_kf):
        T = np.hstack([np.eye(3), [[0.15 * i], [0.0], [0.0]]]).astype(np.float32)
        poses_gt.append(T)

    pt_ids = mp.add_points(
        pts_gt + rng.normal(0, perturb, pts_gt.shape).astype(np.float32),
        np.zeros((n_pts, 8), np.uint32), ref_kf=0, first_kf=0)

    def obs_for(T):
        pc = pts_gt @ T[:, :3].T + T[:, 3]
        uv = np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                       cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1)
        return uv.astype(np.float32)

    for i, T in enumerate(poses_gt):
        uv = obs_for(T)
        n = mp.n_feat
        xy = np.zeros((n, 2), np.float32)
        xy[:n_pts] = uv
        pt_idx = np.full(n, -1, np.int32)
        pt_idx[:n_pts] = pt_ids
        Tp = T.copy()
        if i > 0:  # keyframe 0 anchors the gauge
            Tp[:, 3] += rng.normal(0, perturb, 3).astype(np.float32)
        mp.add_keyframe(Tp, float(i), i, xy, np.zeros(n, np.int32),
                        np.zeros(n, np.float32), np.zeros((n, 8), np.uint32),
                        np.arange(n) < n_pts, pt_idx)
        mp.kf_parent[i] = i - 1 if i > 0 else -1
    return mp, np.stack(poses_gt), pts_gt, pt_ids


def _pose_err(mp, poses_gt, ids):
    return max(float(np.abs(mp.kf_pose[k] - poses_gt[k]).max()) for k in ids)


@pytest.fixture
def cfg():
    return SlamConfig(sensor=Sensor.MONOCULAR, max_keyframes=32,
                      max_points=1024)


class TestGlobalBA:
    def test_background_solve_corrects_late_keyframe(self, cfg):
        """Tracking continues while GBA runs: a keyframe and a point created
        mid-solve end up corrected through the spanning tree
        (src/LoopClosing.cpp:843-905)."""
        mp, poses_gt, pts_gt, pt_ids = _build_map(cfg)
        err_before = _pose_err(mp, poses_gt, range(1, 8))
        gba = GlobalBA(cfg, mp)

        mid = threading.Event()
        release = threading.Event()

        def hook(chunk):
            if chunk == 0:
                mid.set()
                release.wait(timeout=60)

        gba.chunk_hook = hook
        gba.launch(fixed_kf=0)
        assert mid.wait(timeout=120), "solver never reached chunk 0"
        assert gba.running

        # "tracking continues": create a keyframe + a point mid-solve,
        # offset from keyframe 7 by a known relative pose
        T_rel = np.hstack([np.eye(3), [[0.15], [0.0], [0.0]]]).astype(np.float32)
        T7 = mp.kf_pose[7]
        T_new = np.hstack([T_rel[:, :3] @ T7[:, :3],
                           (T_rel[:, :3] @ T7[:, 3] + T_rel[:, 3])[:, None]])
        n = mp.n_feat
        k_late = mp.add_keyframe(
            T_new.astype(np.float32), 8.0, 8, np.zeros((n, 2), np.float32),
            np.zeros(n, np.int32), np.zeros(n, np.float32),
            np.zeros((n, 8), np.uint32), np.zeros(n, bool),
            np.full(n, -1, np.int32))
        mp.kf_parent[k_late] = 7
        p_late = mp.add_points(np.array([[0.0, 0.0, 7.0]], np.float32),
                               np.zeros((1, 8), np.uint32), ref_kf=7,
                               first_kf=k_late)[0]
        # world position of the late point in keyframe 7's (drifty) frame
        Xc_before = mp.kf_pose[7][:, :3] @ mp.pt_xyz[p_late] + mp.kf_pose[7][:, 3]

        assert not gba.poll()  # nothing to apply yet
        release.set()
        assert gba.wait_and_apply(timeout=300)

        # snapshot keyframes moved toward ground truth
        err_after = _pose_err(mp, poses_gt, range(1, 8))
        assert err_after < 0.5 * err_before, (err_before, err_after)
        # the late keyframe kept its exact relative pose to its parent
        T7n = mp.kf_pose[7]
        T_exp = np.hstack([T_rel[:, :3] @ T7n[:, :3],
                           (T_rel[:, :3] @ T7n[:, 3] + T_rel[:, 3])[:, None]])
        np.testing.assert_allclose(mp.kf_pose[k_late], T_exp, atol=1e-4)
        # the late point kept its camera-frame position w.r.t. its ref KF
        Xc_after = T7n[:, :3] @ mp.pt_xyz[p_late] + T7n[:, 3]
        np.testing.assert_allclose(Xc_after, Xc_before, atol=1e-4)

    def test_second_launch_aborts_first(self, cfg):
        """A new loop arriving mid-GBA aborts the running solve (mbStopGBA /
        mnFullBAIdx, src/LoopClosing.cpp:815-824); only the second applies."""
        mp, poses_gt, _, _ = _build_map(cfg)
        gba = GlobalBA(cfg, mp)

        started = threading.Event()
        block = threading.Event()

        def hook(chunk):
            started.set()
            block.wait(timeout=60)

        gba.chunk_hook = hook
        gba.launch(fixed_kf=0)
        assert started.wait(timeout=120)
        # second loop: launch again; abort_and_join unblocks via the flag
        t = threading.Thread(target=lambda: (time.sleep(0.2), block.set()))
        t.start()
        gba.chunk_hook = None
        gba.launch(fixed_kf=0)
        t.join()
        assert gba.n_aborted == 1
        assert gba.full_ba_idx == 2
        assert gba.wait_and_apply(timeout=300)
        assert gba.n_applied == 1

    def test_abort_discards_result(self, cfg):
        mp, poses_gt, _, _ = _build_map(cfg)
        pose_copy = mp.kf_pose.copy()
        gba = GlobalBA(cfg, mp)

        def hook(chunk):
            gba.request_abort()

        gba.chunk_hook = hook
        gba.launch(fixed_kf=0)
        gba.abort_and_join()
        assert not gba.poll()
        np.testing.assert_array_equal(mp.kf_pose, pose_copy)

    def test_distributed_path_on_mesh(self, cfg):
        """On a multi-device mesh the production GBA routes through the
        sharded CG solver (parallel/dist_ba.dist_ba_solve) — the same code
        path the driver's multichip dryrun validates. Forced here by
        lowering the size threshold; asserts the dispatch actually picks
        the mesh AND the solve still converges."""
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        mp, poses_gt, pts_gt, pt_ids = _build_map(cfg)
        gba = GlobalBA(cfg, mp)
        gba.dist_min_cams = 1
        prob_probe = []
        orig = gba._solver_fn

        def probe(prob):
            solve, n_dev = orig(prob)
            prob_probe.append(n_dev)
            return solve, n_dev

        gba._solver_fn = probe
        before = _pose_err(mp, poses_gt, range(1, 8))
        gba.launch(fixed_kf=0, chunks=2, chunk_iters=(1, 2), background=False)
        assert gba.poll()
        assert prob_probe == [len(jax.devices())]
        after = _pose_err(mp, poses_gt, range(1, 8))
        assert after < 0.4 * before
