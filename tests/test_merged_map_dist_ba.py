"""North-star config 5 (BASELINE.json): multi-sequence merged map refined
by the DISTRIBUTED Schur BA — two independent sessions merge into one map,
and the merged map's global bundle adjustment runs point-sharded over the
8-device mesh, matching the single-device solve."""
import numpy as np
import pytest

import jax.numpy as jnp

from orbslam2_tpu.io import synth
from orbslam2_tpu.local_mapping import build_ba_problem
from orbslam2_tpu.map_merge import merge_maps
from orbslam2_tpu.ops import features as F
from orbslam2_tpu.parallel.dist_ba import make_mesh, dist_ba_solve
from orbslam2_tpu.system import System
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers

from test_slam_e2e import make_cfg


@pytest.mark.slow
def test_merged_map_distributed_ba():
    N = 26
    scene = synth.make_room(seed=5)
    gt = synth.orbit_trajectory(N)
    sys_a = System(make_cfg(scene))
    for i in range(0, 16):
        sys_a.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
    sys_b = System(make_cfg(scene))
    for i in range(10, N):
        sys_b.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
    assert merge_maps(sys_a, sys_b.map), "cross-map alignment not found"

    mp = sys_a.map
    cfg = sys_a.cfg
    cam = cfg.camera
    kfs = [int(k) for k in mp.kf_ids]
    sigma2 = F.sigma2_per_octave(cfg.orb)
    prob, meta = build_ba_problem(mp, cfg, sigma2, kfs, fixed=[kfs[0]])
    E = int(prob.e_valid.shape[0])

    # distributed solve: edges + point blocks sharded over all 8 devices
    res8 = dist_ba_solve(prob, make_mesh(8), cam.fx, cam.fy, cam.cx, cam.cy,
                         cam.bf, iters1=2, iters2=3, cg_iters=12)
    res1 = dist_ba_solve(prob, make_mesh(1), cam.fx, cam.fy, cam.cx, cam.cy,
                         cam.bf, iters1=2, iters2=3, cg_iters=12)

    assert np.isfinite(float(res8.cost))
    dT = float(np.abs(np.asarray(res8.cam_T) - np.asarray(res1.cam_T)).max())
    assert dT < 1e-3, f"sharded vs single-device poses differ by {dT}"
    n_valid = int(jnp.sum(prob.e_valid))
    inl = int(jnp.sum(res8.e_inlier & prob.e_valid))
    assert inl > 0.7 * n_valid, f"BA rejected too much: {inl}/{n_valid}"

    # write the distributed result back: the merged keyframe trajectory must
    # stay consistent with ground truth across BOTH sessions
    cam_T = np.asarray(res8.cam_T)
    for i, k in enumerate(meta["cam_arr"]):
        if int(k) != kfs[0]:
            mp.kf_pose[int(k)] = cam_T[i]
    ids = mp.kf_ids
    fids = np.round(mp.kf_timestamp[ids] * 30).astype(int)
    ate = ate_rmse(camera_centers(mp.kf_pose[ids]), camera_centers(gt[fids]))
    assert np.isfinite(ate) and ate < 0.6, \
        f"post-dist-BA merged-map ATE {ate*100:.1f} cm"
