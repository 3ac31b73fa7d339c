"""Accuracy experiment harness: runs the e2e synthetic scenarios from
tests/test_slam_e2e.py at full length and prints ATE numbers, so front-end /
optimizer changes can be evaluated quickly outside pytest.

Usage: python scripts/exp_accuracy.py [mono|rgbd|both] [N]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from orbslam2_tpu.config import SlamConfig, Sensor, with_camera  # noqa: E402
from orbslam2_tpu.io import synth  # noqa: E402
from orbslam2_tpu.system import System  # noqa: E402
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers  # noqa: E402


def make_cfg(scene, sensor=Sensor.MONOCULAR, **kw):
    return with_camera(
        SlamConfig(sensor=sensor, **kw),
        fx=float(scene.K[0, 0]), fy=float(scene.K[1, 1]),
        cx=float(scene.K[0, 2]), cy=float(scene.K[1, 2]),
        width=scene.width, height=scene.height)


def run_mono(N=30, seed=0):
    scene = synth.make_room(seed=seed)
    gt = synth.orbit_trajectory(N)
    slam = System(make_cfg(scene))
    t0 = time.perf_counter()
    for i in range(N):
        slam.track_monocular(synth.render_room(scene, gt[i], seed=i), i / 30.0)
    dt = time.perf_counter() - t0
    ts, est = slam.tracker.trajectory()
    fids = np.round(np.asarray(ts) * 30).astype(int)
    ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]))
    print(f"mono  seed={seed} N={N}: ATE(Sim3) {ate*100:6.2f} cm  "
          f"tracked={len(est)}/{N}  kfs={slam.map.n_keyframes} "
          f"pts={slam.map.n_points}  {dt:.1f}s")
    return ate


def run_rgbd(N=17, seed=2):
    from dataclasses import replace
    scene = synth.make_room(seed=seed)
    gt = synth.orbit_trajectory(N)
    cfg = make_cfg(scene, sensor=Sensor.RGBD, th_depth=25.0)
    cfg = replace(cfg, camera=replace(cfg.camera, bf=250.0))
    slam = System(cfg)
    t0 = time.perf_counter()
    for i in range(N):
        img = synth.render_room(scene, gt[i], seed=i)
        slam.track_rgbd(img, synth.depth_room(scene, gt[i]), i / 30.0)
    dt = time.perf_counter() - t0
    ts, est = slam.tracker.trajectory()
    fids = np.round(np.asarray(ts) * 30).astype(int)
    ate = ate_rmse(camera_centers(est), camera_centers(gt[fids]),
                   with_scale=False)
    print(f"rgbd  seed={seed} N={N}: ATE(SE3)  {ate*100:6.2f} cm  "
          f"tracked={len(est)}/{N}  kfs={slam.map.n_keyframes} "
          f"pts={slam.map.n_points}  {dt:.1f}s")
    return ate


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if which in ("mono", "both"):
        run_mono(N or 30)
    if which in ("rgbd", "both"):
        run_rgbd(N or 17)
