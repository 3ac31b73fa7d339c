"""Per-frame RGB-D divergence diagnosis: track the synthetic room and print
per-frame pose error vs GT plus map stats. Toggle refinement stages via env:
  NOREF_TRACK=1    disable tracking-level refinement
  NOREF_MAPPING=1  disable local-mapping (KF/triangulation/fuse) refinement
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from orbslam2_tpu.config import SlamConfig, Sensor, with_camera  # noqa: E402
from orbslam2_tpu.io import synth  # noqa: E402
from orbslam2_tpu.system import System  # noqa: E402

if os.environ.get("NOREF_TRACK"):
    from orbslam2_tpu.tracking import Tracker
    Tracker._refine_measurements = lambda self, *a, **k: None
if os.environ.get("NOREF_MAPPING"):
    from orbslam2_tpu.local_mapping import LocalMapper
    LocalMapper._refine_obs_absolute = lambda self, *a, **k: None


def main(N=17, seed=2):
    from dataclasses import replace
    scene = synth.make_room(seed=seed)
    gt = synth.orbit_trajectory(N)
    cfg = with_camera(
        SlamConfig(sensor=Sensor.RGBD, th_depth=25.0),
        fx=float(scene.K[0, 0]), fy=float(scene.K[1, 1]),
        cx=float(scene.K[0, 2]), cy=float(scene.K[1, 2]),
        width=scene.width, height=scene.height)
    cfg = replace(cfg, camera=replace(cfg.camera, bf=250.0))
    slam = System(cfg)
    for i in range(N):
        img = synth.render_room(scene, gt[i], seed=i)
        T = slam.track_rgbd(img, synth.depth_room(scene, gt[i]), i / 30.0)
        if T is None:
            print(f"f{i:3d} LOST")
            continue
        # camera-center error vs GT
        C_est = -T[:, :3].T @ T[:, 3]
        C_gt = -gt[i][:, :3].T @ gt[i][:, 3]
        err = np.linalg.norm(C_est - C_gt)
        # keyframe pose error vs GT (kf_frame_id -> gt index)
        mp = slam.map
        kf_errs = []
        for k in np.flatnonzero(mp.kf_valid):
            fid = int(mp.kf_frame_id[k])
            Tk = mp.kf_pose[k]
            Ck = -Tk[:, :3].T @ Tk[:, 3]
            Cg = -gt[fid][:, :3].T @ gt[fid][:, 3]
            kf_errs.append(np.linalg.norm(Ck - Cg))
        # map-point error vs GT surface: reproject into the CREATING kf view
        # using GT pose and compare against GT depth along that ray
        pts = np.flatnonzero(mp.pt_valid)
        perr = []
        for k in np.flatnonzero(mp.kf_valid):
            fid = int(mp.kf_frame_id[k])
            sel = pts[mp.pt_ref_kf[pts] == k][:300]
            if not len(sel):
                continue
            Xc = mp.pt_xyz[sel] @ gt[fid][:, :3].T + gt[fid][:, 3]
            z = Xc[:, 2]
            u = scene.K[0, 0] * Xc[:, 0] / z + scene.K[0, 2]
            v = scene.K[1, 1] * Xc[:, 1] / z + scene.K[1, 2]
            dg = synth.depth_room(scene, gt[fid])
            ok2 = (z > 0.3) & (u >= 0) & (u < 639) & (v >= 0) & (v < 479)
            zgt = dg[np.round(v[ok2]).astype(int), np.round(u[ok2]).astype(int)]
            perr.extend(np.abs(z[ok2] - zgt))
        kf_s = " ".join(f"{e*100:.1f}" for e in kf_errs)
        print(f"f{i:3d} err={err*100:7.2f} cm inl={slam.tracker.matches_inliers:4d} "
              f"kfs={slam.map.n_keyframes} pts={slam.map.n_points} "
              f"ptz_med={np.median(perr)*100:.1f}cm kf_err_cm=[{kf_s}]")


if __name__ == "__main__":
    main()
