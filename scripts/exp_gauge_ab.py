"""A/B: local-BA gauge fixing — "window" (extra anchors) vs "ref" (the
reference's exact src/Optimizer.cpp:640-652 rule). Prints mono + RGB-D ATE
for both so the PARITY.md deviation row carries a measured effect.

Usage: python scripts/exp_gauge_ab.py [N]
"""
import sys
from dataclasses import replace

import numpy as np

sys.path.insert(0, ".")

from orbslam2_tpu.config import SlamConfig, Sensor, with_camera  # noqa: E402
from orbslam2_tpu.io import synth  # noqa: E402
from orbslam2_tpu.system import System  # noqa: E402
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers  # noqa: E402


def make_cfg(scene, sensor, gauge, **kw):
    cfg = with_camera(
        SlamConfig(sensor=sensor, local_ba_gauge=gauge, **kw),
        fx=float(scene.K[0, 0]), fy=float(scene.K[1, 1]),
        cx=float(scene.K[0, 2]), cy=float(scene.K[1, 2]),
        width=scene.width, height=scene.height)
    return cfg


def run(sensor, gauge, N, seed=0):
    scene = synth.make_room(seed=seed)
    gt = synth.orbit_trajectory(N)
    if sensor == Sensor.RGBD:
        cfg = make_cfg(scene, sensor, gauge, th_depth=25.0)
        cfg = replace(cfg, camera=replace(cfg.camera, bf=250.0))
    else:
        cfg = make_cfg(scene, sensor, gauge)
    slam = System(cfg)
    for i in range(N):
        img = synth.render_room(scene, gt[i], seed=i)
        if sensor == Sensor.RGBD:
            slam.track_rgbd(img, synth.depth_room(scene, gt[i]), i / 30.0)
        else:
            slam.track_monocular(img, i / 30.0)
    ts, est = slam.tracker.trajectory()
    fids = np.round(np.asarray(ts) * 30).astype(int)
    ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]))
    name = "mono" if sensor == Sensor.MONOCULAR else "rgbd"
    print(f"{name:5s} gauge={gauge:6s} N={N}: ATE {ate*100:6.2f} cm  "
          f"tracked={len(est)}/{N}  kfs={slam.map.n_keyframes}")
    return ate


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    for sensor in (Sensor.MONOCULAR, Sensor.RGBD):
        for gauge in ("window", "ref"):
            run(sensor, gauge, N)
