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


class TestSubpixelRefine:
    def test_refinement_improves_depth(self):
        """Sub-pixel SAD refinement must beat integer-keypoint disparity on
        the exact rendered stereo pair."""
        from orbslam2_tpu.config import Sensor, with_camera, SlamConfig
        from orbslam2_tpu.frontend.stereo import stereo_depths_for_frame, stereo_depths_refined
        from orbslam2_tpu.io.synth import make_room, render_room, depth_room
        baseline = 0.5
        scene = make_room(seed=7)
        T = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
        Tr = T.copy(); Tr[0, 3] = -baseline
        left = render_room(scene, T, seed=1)
        right = render_room(scene, Tr, seed=2)
        dgt = depth_room(scene, T)
        cfg = with_camera(SlamConfig(sensor=Sensor.STEREO),
                          fx=500., fy=500., cx=320., cy=240., bf=baseline*500.,
                          width=640, height=480)
        from orbslam2_tpu.ops import features as F
        feats = F.extract_orb(jnp.asarray(left), cfg.orb, 480, 640)
        ur0, d0, _ = stereo_depths_for_frame(cfg, feats, right)
        ur1, d1 = stereo_depths_refined(cfg, feats, left, right)
        xy = np.asarray(feats.xy)
        d0, d1 = np.asarray(d0), np.asarray(d1)

        def med_err(d):
            m = d > 0
            xi = np.clip(xy[m, 0].astype(int), 0, 639)
            yi = np.clip(xy[m, 1].astype(int), 0, 479)
            gt = dgt[yi, xi]
            ok = gt > 0
            return np.median(np.abs(d[m][ok] - gt[ok]) / gt[ok])

        e0, e1 = med_err(np.asarray(d0)), med_err(d1)
        # keypoint-to-keypoint disparity is already sub-pixel (Harris-snapped
        # detection): sub-1% depth error WITHOUT the SAD slide. The SAD
        # refine (reference's remedy for integer keypoints) must stay sane
        # but is not the default path.
        assert e0 < 0.01, e0
        assert e1 < 0.03, e1
        assert (d1 > 0).sum() > 100
