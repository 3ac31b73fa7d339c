"""Find a loop-closure test config with REAL accumulated drift: sweep image
noise / circuit size, print pre-correction vs post-correction ATE."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from orbslam2_tpu.io import synth
from orbslam2_tpu.system import System
from orbslam2_tpu.utils.evaluation import ate_rmse, camera_centers
sys.path.insert(0, "tests")
from test_slam_e2e import make_cfg


def run(N, radius, noise, depth=0, half_w=0, half_h=0, seed=3, fx_err=1.0,
        corridor=False, outer=10.0, inner=5.0, rgbd=False):
    from dataclasses import replace
    from orbslam2_tpu.config import Sensor
    if corridor:
        scene = synth.make_corridor(seed=seed, outer=outer, inner=inner)
        gt = synth.corridor_trajectory(N, radius=radius)
    else:
        scene = synth.make_room(seed=seed, depth=depth, half_w=half_w,
                                half_h=half_h)
        gt = synth.loop_trajectory(N, radius=radius)
    if rgbd:
        cfg = make_cfg(scene, sensor=Sensor.RGBD, th_depth=25.0)
        cfg = replace(cfg, camera=replace(cfg.camera, bf=250.0))
    else:
        cfg = make_cfg(scene)
    if fx_err != 1.0:
        # miscalibrated intrinsics: systematic odometry drift that
        # accumulates around the circuit (what real cameras do)
        cfg = replace(cfg, camera=replace(cfg.camera,
                                          fx=cfg.camera.fx * fx_err,
                                          fy=cfg.camera.fy * fx_err))
    slam = System(cfg)
    pre = {}
    orig = slam.loop_closer._correct_loop

    def measure():
        ts, est = slam.tracker.trajectory()
        if len(est) < 10:
            return None, None
        fids = np.round(np.asarray(ts) * 30).astype(int)
        return ate_rmse(camera_centers(est), camera_centers(gt[fids]),
                        with_scale=not rgbd), fids

    def wrapped(kf, kc, s12, R12, t12):
        if "ate" not in pre:
            a, fids = measure()
            pre["ate"], pre["nf"] = a, len(fids) if fids is not None else 0
        return orig(kf, kc, s12, R12, t12)

    slam.loop_closer._correct_loop = wrapped
    tracked = 0
    t0 = time.time()
    for i in range(N):
        img = synth.render_room(scene, gt[i], noise=noise, seed=i)
        if rgbd:
            pose = slam.track_rgbd(img, synth.depth_room(scene, gt[i]),
                                   i / 30.0)
        else:
            pose = slam.track_monocular(img, i / 30.0)
        tracked += pose is not None
    slam.shutdown()
    stats = slam.map_stats()
    ate, _ = measure()
    print(f"N={N} r={radius} noise={noise} rgbd={rgbd}"
          f" room=({depth},{half_w},{half_h}):"
          f" tracked {tracked}/{N}, loops={stats['loops']},"
          f" gba_applied={slam.global_ba.n_applied},"
          f" pre-ATE={100*pre.get('ate', float('nan')):.1f}cm"
          f"@{pre.get('nf', 0)}f, post-ATE={100*ate:.1f}cm,"
          f" {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    cfg_id = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    cfgs = [
        dict(N=180, radius=2.2, noise=6.0, depth=10.0, half_w=6.0, half_h=3.5),
        dict(N=240, radius=2.8, noise=4.0, depth=12.0, half_w=7.0, half_h=4.0),
        dict(N=180, radius=2.2, noise=2.5, depth=10.0, half_w=6.0, half_h=3.5),
        dict(N=180, radius=2.2, noise=2.5, depth=10.0, half_w=6.0, half_h=3.5,
             fx_err=1.02),
        dict(N=180, radius=2.2, noise=2.5, depth=10.0, half_w=6.0, half_h=3.5,
             fx_err=1.04),
        dict(N=240, radius=8.0, noise=2.5, corridor=True),
        dict(N=300, radius=8.0, noise=2.5, corridor=True),
        dict(N=240, radius=8.0, noise=2.5, corridor=True, rgbd=True),
    ]
    run(**cfgs[cfg_id])
