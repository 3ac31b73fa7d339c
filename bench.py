"""Driver benchmark: tracked frames/s per chip on the fused tracking program.

Runs on the default platform (the real TPU chip under axon). Renders a
synthetic corner-rich sequence with exact ground truth, builds a map from
frame 0 (keypoints associated to known 3D scene points), then tracks every
subsequent frame with the single-dispatch fused program
(orbslam2_tpu.engine_step.tracking_step: pyramid FAST+BRIEF extraction ->
projection-guided Hamming matching -> 4x10 LM pose optimization).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: the reference binary, built from /root/reference and run
head-to-head on this machine (BASELINE.md "MEASURED baseline"), tracks at
33.7 ms/frame median = 29.7 fps on CPU; we keep the 30 fps figure the
reference also targets as its real-time budget (pacing loop
Examples/Monocular/mono_tum.cc:97-105), so vs_baseline = fps / 30.

MEASUREMENT HYGIENE (matters enormously on remote-attached TPU runtimes):
the timed loop must never read device data back to the host. On the axon
relay, the first device->host transfer costs ~1 min of lazy transfer-path
setup, and afterwards the process permanently drops into a
round-trip-per-sync mode (~24 ms per blocking call, measured). So the map
build runs as a jitted device program, all sanity checks read back only
AFTER the timing loop, and the loop itself is async-dispatched with a
single block_until_ready at the end (frames form a true dependency chain
through the pose, as a pipelined production driver would run them).
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
    N_WARM, N_MEAS, N_REP = 4, 40, 5

    scene = synth.make_scene(seed=0, width=W, height=H, fx=fx, fy=fy)
    gt = synth.orbit_trajectory(N_WARM + N_MEAS + 1)
    sf = jnp.asarray(F.scale_factors(params))
    sig2 = jnp.asarray(F.sigma2_per_octave(params))

    # --- frame-0 map build, entirely on device: associate extracted
    # keypoints to the known 3D squares they sit on (nearest projected
    # scene point within the square's pixel footprint) ---
    pc = scene.pts @ gt[0][:, :3].T + gt[0][:, 3]          # host numpy
    u_s = (fx * pc[:, 0] / pc[:, 2] + cx).astype(np.float32)
    v_s = (fy * pc[:, 1] / pc[:, 2] + cy).astype(np.float32)
    half_px = (scene.size_world * fx / pc[:, 2]).astype(np.float32)

    @jax.jit
    def build_map(img0, scene_pts, u_s, v_s, half_px):
        f0 = F.extract_orb(img0, params, H, W)
        d2 = ((u_s[None, :] - f0.xy[:, 0:1]) ** 2
              + (v_s[None, :] - f0.xy[:, 1:2]) ** 2)       # [K, S]
        j = jnp.argmin(d2, axis=1)
        dj = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
        gate = f0.valid & (dj < (2.0 * half_px[j]) ** 2)
        return scene_pts[j], f0.desc, f0.octave, gate

    img0 = jnp.asarray(synth.render(scene, gt[0], seed=0))
    pts_xyz, pt_desc, pt_oct, pt_valid = build_map(
        img0, jnp.asarray(scene.pts.astype(np.float32)),
        jnp.asarray(u_s), jnp.asarray(v_s), jnp.asarray(half_px))
    n_map = jnp.sum(pt_valid)  # device scalar; read back after timing

    args_static = dict(params=params, height=H, width=W, fx=fx, fy=fy,
                       cx=cx, cy=cy, bf=0.0)
    jp = (pts_xyz, pt_desc, pt_oct, pt_valid)

    imgs = [jnp.asarray(synth.render(scene, gt[i], seed=i))
            for i in range(1, N_WARM + N_MEAS + 1)]
    T0 = jnp.asarray(gt[0])

    # warmup (compile)
    T = T0
    for i in range(N_WARM):
        T, ninl, _ = tracking_step(imgs[i], T, *jp, sf, sig2, **args_static)
    jax.block_until_ready(T)

    # async dispatch, one final sync per repeat: frames form a device-side
    # dependency chain through T, so this measures true sequential
    # per-frame device throughput with host/tunnel latency overlapped (as
    # a pipelined production driver would run it). No readbacks inside.
    per_frame_ms = []
    ninls = []
    for rep in range(N_REP):
        T = T0
        rep_ninls = []
        t0 = time.perf_counter()
        for i in range(N_WARM, N_WARM + N_MEAS):
            T, ninl, _ = tracking_step(imgs[i], T, *jp, sf, sig2,
                                       **args_static)
            rep_ninls.append(ninl)
        jax.block_until_ready(T)
        per_frame_ms.append((time.perf_counter() - t0) / N_MEAS * 1e3)
        if rep == 0:
            ninls = rep_ninls

    # ---- measurement over; readbacks are allowed from here on ----
    med = float(np.median(per_frame_ms))
    fps = 1000.0 / med
    inl_hist = [int(x) for x in ninls]
    med_inl = int(np.median(inl_hist))
    map_ok = int(n_map) >= 100
    # sanity: it must actually be tracking (enough inliers throughout)
    tracking_ok = map_ok and med_inl >= 50
    result = {
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2) if tracking_ok else 0.0,
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3) if tracking_ok else 0.0,
    }
    print(json.dumps(result))
    print(f"# median frame {med:.3f} ms (reps: "
          f"{', '.join(f'{m:.3f}' for m in per_frame_ms)}), "
          f"median inliers {med_inl}, map points {int(n_map)}, "
          f"frames {N_MEAS}x{N_REP}, device {jax.devices()[0].platform}",
          file=sys.stderr)

    # --- secondary (stderr): FULL System throughput — init, mapping, BA,
    # keyframes, loop machinery all live (tracking.Tracker._track_fused
    # steady-state path). Not the headline metric; recorded for VERDICT
    # item "full-System TPU fps". ---
    try:
        full = _full_system_fps()
        print(f"# full-System: {full}", file=sys.stderr)
    except Exception as e:  # never fail the bench on the secondary number
        print(f"# full-System: failed ({type(e).__name__}: {e})",
              file=sys.stderr)
    return 0


def _full_system_fps():
    import time
    import numpy as np
    from orbslam2_tpu.config import SlamConfig, Sensor, with_camera
    from orbslam2_tpu.io import synth
    from orbslam2_tpu.system import System

    n_frames = 40
    scene = synth.make_room(seed=0)
    gt = synth.orbit_trajectory(n_frames)
    cfg = with_camera(
        SlamConfig(sensor=Sensor.MONOCULAR),
        fx=float(scene.K[0, 0]), fy=float(scene.K[1, 1]),
        cx=float(scene.K[0, 2]), cy=float(scene.K[1, 2]),
        k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
        width=scene.width, height=scene.height)
    slam = System(cfg)
    imgs = [np.clip(synth.render_room(scene, gt[i], seed=i), 0, 255
                    ).astype(np.uint8) for i in range(n_frames)]
    times = []
    tracked = 0
    for i, img in enumerate(imgs):
        t0 = time.perf_counter()
        pose = slam.track_monocular(img, i / 30.0)
        times.append(time.perf_counter() - t0)
        tracked += pose is not None
    med = float(np.median(times[5:]))  # skip compile warmup frames
    return (f"median {med*1e3:.1f} ms/frame ({1.0/med:.1f} fps), "
            f"tracked {tracked}/{n_frames}, "
            f"keyframes {slam.map.n_keyframes}")


if __name__ == "__main__":
    raise SystemExit(main())
