import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import SlamConfig, Sensor, with_camera
from orbslam2_tpu.io import synth
from orbslam2_tpu.ops import features as F
from orbslam2_tpu.ops import stereo as S


def stereo_pair(baseline=0.12, seed=0):
    scene = synth.make_scene(seed=seed, n_pts=400)
    T_l = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    T_r = T_l.copy()
    T_r[0, 3] = -baseline  # right camera shifted +x in world => t_x = -b
    left = synth.render(scene, T_l, seed=1)
    right = synth.render(scene, T_r, seed=2)
    return scene, left, right


class TestStereoMatch:
    def test_depth_recovery(self):
        baseline = 0.12
        scene, left, right = stereo_pair(baseline)
        cfg = SlamConfig()
        params = cfg.orb
        fl = F.extract_orb(jnp.asarray(left), params, 480, 640)
        fr = F.extract_orb(jnp.asarray(right), params, 480, 640)
        fx = float(scene.K[0, 0])
        bf = baseline * fx
        ur, depth = S.stereo_match(
            fl.xy, fl.octave, fl.desc, fl.valid,
            fr.xy, fr.octave, fr.desc, fr.valid,
            jnp.asarray(F.scale_factors(params)), bf, fx)
        ur, depth = np.asarray(ur), np.asarray(depth)
        matched = depth > 0
        assert matched.sum() > 150, matched.sum()

        # ground-truth depth at each left keypoint: depth of the nearest
        # scene square center projected into the left view
        uv_scene = scene.pts[:, :2] / scene.pts[:, 2:]
        u_s = scene.K[0, 0] * uv_scene[:, 0] + scene.K[0, 2]
        v_s = scene.K[1, 1] * uv_scene[:, 1] + scene.K[1, 2]
        xy = np.asarray(fl.xy)
        errs = []
        for i in np.flatnonzero(matched):
            d2 = (u_s - xy[i, 0]) ** 2 + (v_s - xy[i, 1]) ** 2
            j = np.argmin(d2)
            if d2[j] < 15 ** 2:
                errs.append(abs(depth[i] - scene.pts[j, 2]) / scene.pts[j, 2])
        errs = np.array(errs)
        assert len(errs) > 100
        # keypoint-grid disparity precision (~1px at 10px disparity).
        # TODO: tighten to <0.03 once sub-pixel SAD refinement lands.
        assert np.median(errs) < 0.15, np.median(errs)

    def test_no_matches_on_unrelated_images(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 255, (480, 640)).astype(np.float32)
        b = rng.uniform(0, 255, (480, 640)).astype(np.float32)
        cfg = SlamConfig()
        fa = F.extract_orb(jnp.asarray(a), cfg.orb, 480, 640)
        fb = F.extract_orb(jnp.asarray(b), cfg.orb, 480, 640)
        ur, depth = S.stereo_match(
            fa.xy, fa.octave, fa.desc, fa.valid,
            fb.xy, fb.octave, fb.desc, fb.valid,
            jnp.asarray(F.scale_factors(cfg.orb)), 60.0, 500.0)
        # pure-noise descriptors rarely fall under TH_HIGH within the band
        assert (np.asarray(depth) > 0).mean() < 0.30
