"""Driver benchmark: tracked frames/s per chip on the fused tracking program.

Runs on the default platform (the real TPU chip under axon). Renders a
synthetic corner-rich sequence with exact ground truth, builds a map from
frame 0 (keypoints associated to known 3D scene points), then tracks every
subsequent frame with the single-dispatch fused program
(orbslam2_tpu.engine_step.tracking_step: pyramid FAST+BRIEF extraction ->
projection-guided Hamming matching -> 4x10 LM pose optimization).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference (ORB-SLAM2) is real-time at 30 fps on CPU for
TUM-class sequences (BASELINE.md; pacing loop Examples/Monocular/
mono_tum.cc:97-105), so vs_baseline = fps / 30.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from orbslam2_tpu.config import OrbParams
    from orbslam2_tpu.engine_step import tracking_step
    from orbslam2_tpu.io import synth
    from orbslam2_tpu.ops import features as F

    params = OrbParams()
    H, W = 480, 640
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    N_WARM, N_MEAS = 4, 40

    scene = synth.make_scene(seed=0, width=W, height=H, fx=fx, fy=fy)
    gt = synth.orbit_trajectory(N_WARM + N_MEAS + 1)
    sf = jnp.asarray(F.scale_factors(params))
    sig2 = jnp.asarray(F.sigma2_per_octave(params))

    # --- build the map from frame 0: associate extracted keypoints to the
    # known 3D squares they sit on ---
    img0 = synth.render(scene, gt[0], seed=0)
    f0 = F.extract_orb(jnp.asarray(img0), params, H, W)
    xy0 = np.asarray(f0.xy)
    valid0 = np.asarray(f0.valid)
    pc = scene.pts @ gt[0][:, :3].T + gt[0][:, 3]
    u_s = fx * pc[:, 0] / pc[:, 2] + cx
    v_s = fy * pc[:, 1] / pc[:, 2] + cy
    half_px = scene.size_world * fx / pc[:, 2]

    cap = 1024
    pts_xyz = np.zeros((cap, 3), np.float32)
    pt_desc = np.zeros((cap, 8), np.uint32)
    pt_oct = np.zeros(cap, np.int32)
    pt_valid = np.zeros(cap, bool)
    desc0 = np.asarray(f0.desc)
    oct0 = np.asarray(f0.octave)
    n = 0
    for i in np.flatnonzero(valid0):
        d2 = (u_s - xy0[i, 0]) ** 2 + (v_s - xy0[i, 1]) ** 2
        j = int(np.argmin(d2))
        # keypoint must sit on/near square j (corners are at +-half_px)
        if d2[j] < (2.0 * half_px[j]) ** 2 and n < cap:
            pts_xyz[n] = scene.pts[j]
            pt_desc[n] = desc0[i]
            pt_oct[n] = oct0[i]
            pt_valid[n] = True
            n += 1
    if n < 100:
        print(json.dumps({"metric": "tracked_frames_per_s_per_chip", "value": 0.0,
                          "unit": "fps", "vs_baseline": 0.0, "error": "map build failed"}))
        return 1

    args_static = dict(params=params, height=H, width=W, fx=fx, fy=fy,
                       cx=cx, cy=cy, bf=0.0)
    jp = (jnp.asarray(pts_xyz), jnp.asarray(pt_desc), jnp.asarray(pt_oct),
          jnp.asarray(pt_valid))

    imgs = [jnp.asarray(synth.render(scene, gt[i], seed=i))
            for i in range(1, N_WARM + N_MEAS + 1)]

    # warmup (compile)
    T = jnp.asarray(gt[0])
    inl_hist = []
    for i in range(N_WARM):
        T, ninl, _ = tracking_step(imgs[i], T, *jp, sf, sig2, **args_static)
    jax.block_until_ready(T)

    # async dispatch, one final sync: frames form a device-side dependency
    # chain through T, so this measures true sequential per-frame device
    # throughput with host/tunnel latency overlapped (as a pipelined
    # production driver would run it)
    ninls = []
    t0 = time.perf_counter()
    for i in range(N_WARM, N_WARM + N_MEAS):
        T, ninl, _ = tracking_step(imgs[i], T, *jp, sf, sig2, **args_static)
        ninls.append(ninl)
    jax.block_until_ready(T)
    total = time.perf_counter() - t0
    inl_hist = [int(x) for x in ninls]

    med = total / N_MEAS
    fps = 1.0 / med
    med_inl = int(np.median(inl_hist))
    # sanity: it must actually be tracking (enough inliers throughout)
    tracking_ok = med_inl >= 50
    result = {
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2) if tracking_ok else 0.0,
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3) if tracking_ok else 0.0,
    }
    print(json.dumps(result))
    print(f"# median frame {med*1e3:.2f} ms, median inliers {med_inl}, "
          f"frames {N_MEAS}, device {jax.devices()[0].platform}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
