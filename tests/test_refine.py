"""Feature-metric subpixel refinement (ops/refine.py) unit tests."""
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.ops import features as F
from orbslam2_tpu.ops import refine as RF


def _smooth_field(seed, freqs=6):
    """Random smooth 2D intensity function f(x, y) on arbitrary real coords."""
    rng = np.random.default_rng(seed)
    k = rng.uniform(-0.5, 0.5, (freqs, 2))
    ph = rng.uniform(0, 2 * np.pi, freqs)
    amp = rng.uniform(20, 60, freqs)

    def f(x, y):
        v = 128.0
        for i in range(freqs):
            v = v + amp[i] * np.sin(k[i, 0] * x + k[i, 1] * y + ph[i])
        return v

    return f


class TestRefineOffsets:
    def test_recovers_known_subpixel_shift(self):
        M = 64
        rng = np.random.default_rng(0)
        true = rng.uniform(-1.4, 1.4, (M, 2)).astype(np.float32)
        wins = np.zeros((M, F.PATCH_WIN, F.PATCH_WIN), np.float32)
        tpls = np.zeros((M, F.TEMPLATE_WIN, F.TEMPLATE_WIN), np.float32)
        rw, rt = F.PATCH_WIN // 2, F.TEMPLATE_WIN // 2
        for m in range(M):
            f = _smooth_field(m)
            gy, gx = np.mgrid[-rw:rw + 1, -rw:rw + 1]
            wins[m] = f(gx, gy)
            gy, gx = np.mgrid[-rt:rt + 1, -rt:rt + 1]
            # template = the field sampled around the TRUE position
            tpls[m] = f(gx + true[m, 0], gy + true[m, 1])
        delta, ok = RF.refine_offsets(jnp.asarray(wins), jnp.asarray(tpls),
                                      jnp.asarray(np.ones(M, bool)))
        delta, ok = np.asarray(delta), np.asarray(ok)
        assert ok.mean() > 0.9
        err = np.abs(delta[ok] - true[ok])
        assert np.median(err) < 0.03, f"median err {np.median(err)}"
        # occasional weak-gradient fields converge to secondary minima; those
        # measurements are pruned downstream by the chi2 gates
        assert np.quantile(err, 0.9) < 0.1

    def test_bias_gain_invariance(self):
        M = 16
        rng = np.random.default_rng(1)
        true = rng.uniform(-1.0, 1.0, (M, 2)).astype(np.float32)
        wins = np.zeros((M, F.PATCH_WIN, F.PATCH_WIN), np.float32)
        tpls = np.zeros((M, F.TEMPLATE_WIN, F.TEMPLATE_WIN), np.float32)
        rw, rt = F.PATCH_WIN // 2, F.TEMPLATE_WIN // 2
        for m in range(M):
            f = _smooth_field(100 + m)
            gy, gx = np.mgrid[-rw:rw + 1, -rw:rw + 1]
            wins[m] = f(gx, gy)
            gy, gx = np.mgrid[-rt:rt + 1, -rt:rt + 1]
            tpls[m] = f(gx + true[m, 0], gy + true[m, 1]) + 25.0  # bias shift
        delta, ok = RF.refine_offsets(jnp.asarray(wins), jnp.asarray(tpls),
                                      jnp.asarray(np.ones(M, bool)))
        delta, ok = np.asarray(delta), np.asarray(ok)
        assert ok.mean() > 0.8
        assert np.median(np.abs(delta[ok] - true[ok])) < 0.05

    def test_flat_template_rejected(self):
        wins = np.full((4, F.PATCH_WIN, F.PATCH_WIN), 100.0, np.float32)
        tpls = np.zeros((4, F.TEMPLATE_WIN, F.TEMPLATE_WIN), np.float32)
        delta, ok = RF.refine_offsets(jnp.asarray(wins), jnp.asarray(tpls),
                                      jnp.asarray(np.ones(4, bool)))
        assert not np.asarray(ok).any()
        assert np.allclose(np.asarray(delta), 0.0)

    def test_invalid_mask_respected(self):
        wins = np.random.default_rng(2).uniform(
            0, 255, (4, F.PATCH_WIN, F.PATCH_WIN)).astype(np.float32)
        tpls = np.asarray(RF.template_of(wins))
        valid = np.array([True, False, True, False])
        _, ok = RF.refine_offsets(jnp.asarray(wins), jnp.asarray(tpls),
                                  jnp.asarray(valid))
        ok = np.asarray(ok)
        assert not ok[1] and not ok[3]

    def test_template_of_center_crop(self):
        w = np.arange(F.PATCH_WIN * F.PATCH_WIN, dtype=np.float32).reshape(
            1, F.PATCH_WIN, F.PATCH_WIN)
        t = np.asarray(RF.template_of(w))
        c = (F.PATCH_WIN - F.TEMPLATE_WIN) // 2
        assert t.shape == (1, F.TEMPLATE_WIN, F.TEMPLATE_WIN)
        assert t[0, 0, 0] == w[0, c, c]


class TestExtractionPatches:
    def test_patch_is_centered_on_keypoint(self):
        """The stored window's center pixel must equal the blurred image at
        the subpixel keypoint: refining a feature against (a crop of) its own
        window must return ~zero offset."""
        from orbslam2_tpu.config import OrbParams
        from orbslam2_tpu.io import synth
        scene = synth.make_room(seed=3)
        img = synth.render_room(scene, synth.orbit_trajectory(2)[0], seed=3)
        params = OrbParams(n_features=256)
        feats = F.extract_orb(jnp.asarray(img), params, 480, 640)
        valid = np.asarray(feats.valid)
        wins = np.asarray(feats.patch)
        tpls = np.asarray(RF.template_of(wins))
        delta, ok = RF.refine_offsets(jnp.asarray(wins), jnp.asarray(tpls),
                                      jnp.asarray(valid))
        delta, ok = np.asarray(delta), np.asarray(ok)
        assert ok[valid].mean() > 0.9
        assert np.abs(delta[ok]).max() < 1e-3
