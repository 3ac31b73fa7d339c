import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.geometry import se3, sim3
from orbslam2_tpu.geometry.camera import Intrinsics, project, backproject, undistort_pixels, distort_normalized


def rand_twists(key, n, scale=1.0):
    return jax.random.normal(key, (n, 6)) * scale


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rand_twists(jax.random.PRNGKey(0), 64, 0.7)
        T = se3.se3_exp(xi)
        xi2 = se3.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=2e-4)

    def test_exp_small_angle(self):
        xi = jnp.array([[1e-6, 2e-6, -1e-6, 1e-7, -1e-7, 1e-7]])
        T = se3.se3_exp(xi)
        assert np.isfinite(np.asarray(T)).all()
        np.testing.assert_allclose(np.asarray(se3.rot(T))[0], np.eye(3), atol=1e-5)

    def test_compose_inverse(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        Ta = se3.se3_exp(rand_twists(k1, 8))
        Tb = se3.se3_exp(rand_twists(k2, 8))
        Tab = se3.compose(Ta, Tb)
        ident = se3.compose(Tab, se3.compose(se3.inverse(Tb), se3.inverse(Ta)))
        np.testing.assert_allclose(np.asarray(se3.rot(ident)), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(se3.trans(ident)), np.zeros((8, 3)), atol=1e-5)

    def test_rotation_orthonormal(self):
        T = se3.se3_exp(rand_twists(jax.random.PRNGKey(2), 16, 2.0))
        R = np.asarray(se3.rot(T))
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)

    def test_transform_points(self):
        R = se3.so3_exp(jnp.array([0.0, 0.0, jnp.pi / 2]))
        T = se3.make_T(R, jnp.array([0.1, -0.2, 0.3]))
        p = jnp.array([[1.0, 0.0, 0.0]])
        out = np.asarray(se3.transform_points(T, p))[0]
        np.testing.assert_allclose(out, [0.1, 0.8, 0.3], atol=1e-5)

    def test_camera_center(self):
        xi = rand_twists(jax.random.PRNGKey(3), 4)
        T = se3.se3_exp(xi)
        Ow = se3.camera_center(T)
        # transforming the center into camera frame gives 0
        zero = se3.transform_points(T, Ow[:, None, :])[:, 0]
        np.testing.assert_allclose(np.asarray(zero), np.zeros((4, 3)), atol=1e-5)

    def test_quat_roundtrip(self):
        T = se3.se3_exp(rand_twists(jax.random.PRNGKey(4), 32, 2.5))
        R = se3.rot(T)
        q = se3.R_to_quat(R)
        R2 = se3.quat_to_R(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (32, 7)) * jnp.array([1, 1, 1, 0.6, 0.6, 0.6, 0.3])
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=3e-4)

    def test_identity_and_compose(self):
        xi = jax.random.normal(jax.random.PRNGKey(6), (8, 7)) * 0.4
        S = sim3.exp(xi)
        Sinv = sim3.inverse(S)
        SI = sim3.compose(S, Sinv)
        np.testing.assert_allclose(np.asarray(SI["s"]), np.ones(8), atol=1e-5)
        np.testing.assert_allclose(np.asarray(SI["t"]), np.zeros((8, 3)), atol=1e-5)

    def test_apply_scale(self):
        S = sim3.make(jnp.array(2.0), jnp.eye(3), jnp.array([1.0, 0.0, 0.0]))
        p = jnp.array([[1.0, 1.0, 1.0]])
        out = np.asarray(sim3.apply(S, p))[0]
        np.testing.assert_allclose(out, [3.0, 2.0, 2.0], atol=1e-6)

    def test_sigma_zero_matches_se3(self):
        xi6 = rand_twists(jax.random.PRNGKey(7), 8, 0.5)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        S = sim3.exp(xi7)
        T = se3.se3_exp(xi6)
        np.testing.assert_allclose(np.asarray(S["R"]), np.asarray(se3.rot(T)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S["t"]), np.asarray(se3.trans(T)), atol=1e-4)


class TestCamera:
    CAM = Intrinsics(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                     k1=0.26, k2=-0.95, p1=-0.0054, p2=0.0027, k3=1.16)

    def test_project_backproject(self):
        cam = self.CAM
        pts = jnp.array([[0.3, -0.2, 2.0], [0.0, 0.0, 1.0]])
        uv = project(cam, pts)
        back = backproject(cam, uv, pts[:, 2])
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_undistort_inverts_distort(self):
        cam = self.CAM
        key = jax.random.PRNGKey(8)
        xy = jax.random.uniform(key, (128, 2), minval=-0.3, maxval=0.3)
        xyd = distort_normalized(cam, xy)
        uv_dist = jnp.stack([cam.fx * xyd[:, 0] + cam.cx, cam.fy * xyd[:, 1] + cam.cy], -1)
        uv_und = undistort_pixels(cam, uv_dist)
        expect = np.stack([cam.fx * np.asarray(xy[:, 0]) + cam.cx,
                           cam.fy * np.asarray(xy[:, 1]) + cam.cy], -1)
        np.testing.assert_allclose(np.asarray(uv_und), expect, atol=0.05)

    @pytest.mark.skipif(True, reason="enabled when cv2 parity check is wired")
    def test_cv2_parity(self):
        pass
