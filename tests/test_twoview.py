import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.ops import twoview as TV

K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)


def synth_pair(seed=0, n=256, planar=False, noise=0.3, R=None, t=None):
    rng = np.random.default_rng(seed)
    if planar:
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        np.full(n, 4.0)], axis=-1)
    else:
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(3, 8, n)], axis=-1)
    if R is None:
        R = np.asarray(se3.so3_exp(jnp.array([0.02, -0.05, 0.01])))
    if t is None:
        t = np.array([0.3, 0.02, 0.05], np.float32)

    def proj(P):
        uv = P @ K.T
        return uv[:, :2] / uv[:, 2:]

    xy1 = proj(pts)
    xy2 = proj(pts @ R.T + t)
    xy1 += rng.normal(0, noise, xy1.shape)
    xy2 += rng.normal(0, noise, xy2.shape)
    in_img = ((xy1 > 10) & (xy1 < [630, 470])).all(-1) & ((xy2 > 10) & (xy2 < [630, 470])).all(-1)
    return pts, R, t, xy1.astype(np.float32), xy2.astype(np.float32), in_img


def angular_err_deg(Ra, Rb):
    cos = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


class TestTwoView:
    def test_general_scene_F_path(self):
        pts, R, t, xy1, xy2, w = synth_pair()
        res = TV.initialize_two_view(
            jax.random.PRNGKey(0), jnp.asarray(xy1), jnp.asarray(xy2),
            jnp.asarray(w), jnp.asarray(K))
        assert bool(res.success)
        assert angular_err_deg(np.asarray(res.R), R) < 1.0
        t_est = np.asarray(res.t)
        cos_t = abs(t_est @ t / np.linalg.norm(t))
        assert cos_t > 0.995
        # triangulated points match ground truth up to global scale
        good = np.asarray(res.good)
        assert good.sum() > 100
        X = np.asarray(res.points3d)[good]
        scale = np.median(X[:, 2] / pts[good][:, 2])
        # expected depth std at z~5m, f=500, b=0.3, sigma~0.4px is ~7cm
        err = np.abs(X / scale - pts[good]).max(axis=-1)
        assert np.median(err) < 0.15

    def test_planar_scene_H_path(self):
        pts, R, t, xy1, xy2, w = synth_pair(seed=1, planar=True)
        res = TV.initialize_two_view(
            jax.random.PRNGKey(1), jnp.asarray(xy1), jnp.asarray(xy2),
            jnp.asarray(w), jnp.asarray(K))
        assert bool(res.used_homography)
        assert bool(res.success)
        assert angular_err_deg(np.asarray(res.R), R) < 1.5
        cos_t = abs(np.asarray(res.t) @ t / np.linalg.norm(t))
        assert cos_t > 0.99

    def test_outlier_robustness(self):
        pts, R, t, xy1, xy2, w = synth_pair(seed=2)
        rng = np.random.default_rng(3)
        n_out = 60
        idx = rng.choice(len(xy2), n_out, replace=False)
        xy2c = xy2.copy()
        xy2c[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
        res = TV.initialize_two_view(
            jax.random.PRNGKey(2), jnp.asarray(xy1), jnp.asarray(xy2c),
            jnp.asarray(w), jnp.asarray(K))
        # outliers must be excluded from the good set
        good = np.asarray(res.good)
        assert good[idx].sum() <= 3
        assert angular_err_deg(np.asarray(res.R), R) < 1.5

    def test_pure_rotation_rejected(self):
        # no translation -> no parallax -> must not initialize
        pts, R, t, xy1, xy2, w = synth_pair(seed=4, t=np.zeros(3, np.float32), noise=0.1)
        res = TV.initialize_two_view(
            jax.random.PRNGKey(3), jnp.asarray(xy1), jnp.asarray(xy2),
            jnp.asarray(w), jnp.asarray(K))
        assert not bool(res.success)

    def test_triangulate_exact(self):
        pts, R, t, xy1, xy2, w = synth_pair(seed=5, noise=0.0)
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, t[:, None]])
        X = np.asarray(TV.triangulate_dlt(jnp.asarray(P1.astype(np.float32)),
                                          jnp.asarray(P2.astype(np.float32)),
                                          jnp.asarray(xy1), jnp.asarray(xy2)))
        err = np.linalg.norm(X - pts, axis=-1)
        assert np.median(err) < 1e-2
