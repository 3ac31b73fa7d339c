import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.ops import ba as BA
from orbslam2_tpu.ops import pose_opt as PO

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0
BF = 0.0


def make_scene(seed=0, n_pts=300, n_cams=6, spread=3.0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-spread, spread, n_pts),
                    rng.uniform(-spread * 0.75, spread * 0.75, n_pts),
                    rng.uniform(4, 10, n_pts)], -1).astype(np.float32)
    cams = []
    for i in range(n_cams):
        xi = np.concatenate([rng.normal(0, 0.1, 3) + [0.3 * i, 0, 0],
                             rng.normal(0, 0.02, 3)]).astype(np.float32)
        cams.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    return pts, np.stack(cams)


def project(T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FY * pc[:, 1] / pc[:, 2] + CY], -1), pc[:, 2]


class TestPoseOpt:
    def test_recover_perturbed_pose(self):
        pts, cams = make_scene()
        T_gt = cams[2]
        uv, z = project(T_gt, pts)
        rng = np.random.default_rng(1)
        uv += rng.normal(0, 0.5, uv.shape)
        T0 = np.asarray(se3.compose(
            se3.se3_exp(jnp.asarray([0.05, -0.04, 0.06, 0.01, -0.02, 0.015])),
            jnp.asarray(T_gt)))
        obs = np.concatenate([uv, np.zeros((len(pts), 1))], -1).astype(np.float32)
        res = PO.pose_optimize(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(obs),
            jnp.zeros(len(pts), bool), jnp.ones(len(pts), np.float32),
            jnp.ones(len(pts), bool), FX, FY, CX, CY, BF)
        err = np.asarray(se3.se3_log(se3.compose(res.T, se3.inverse(jnp.asarray(T_gt)))))
        assert np.abs(err[:3]).max() < 0.01, err
        assert np.abs(err[3:]).max() < 0.002, err
        assert int(res.n_inliers) > 280

    def test_outlier_classification(self):
        pts, cams = make_scene(seed=2)
        T_gt = cams[0]
        uv, _ = project(T_gt, pts)
        rng = np.random.default_rng(3)
        out_idx = rng.choice(len(pts), 50, replace=False)
        uv[out_idx] += rng.uniform(15, 60, (50, 2)) * rng.choice([-1, 1], (50, 2))
        obs = np.concatenate([uv, np.zeros((len(pts), 1))], -1).astype(np.float32)
        T0 = np.asarray(se3.compose(
            se3.se3_exp(jnp.asarray([0.02, 0.02, -0.02, 0.005, 0.005, -0.005])),
            jnp.asarray(T_gt)))
        res = PO.pose_optimize(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(obs),
            jnp.zeros(len(pts), bool), jnp.ones(len(pts), np.float32),
            jnp.ones(len(pts), bool), FX, FY, CX, CY, BF)
        inl = np.asarray(res.inliers)
        assert inl[out_idx].sum() <= 2
        assert inl.sum() >= 240
        err = np.asarray(se3.se3_log(se3.compose(res.T, se3.inverse(jnp.asarray(T_gt)))))
        assert np.abs(err).max() < 0.01

    def test_stereo_observations(self):
        pts, cams = make_scene(seed=4)
        bf = 0.2 * FX
        T_gt = cams[1]
        pc = pts @ T_gt[:3, :3].T + T_gt[:3, 3]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        ur = u - bf / pc[:, 2]
        obs = np.stack([u, v, ur], -1).astype(np.float32)
        T0 = np.asarray(se3.compose(
            se3.se3_exp(jnp.asarray([0.1, -0.05, 0.08, 0.02, 0.01, -0.02])),
            jnp.asarray(T_gt)))
        res = PO.pose_optimize(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(obs),
            jnp.ones(len(pts), bool), jnp.ones(len(pts), np.float32),
            jnp.ones(len(pts), bool), FX, FY, CX, CY, bf)
        err = np.asarray(se3.se3_log(se3.compose(res.T, se3.inverse(jnp.asarray(T_gt)))))
        assert np.abs(err).max() < 1e-3, err


def build_problem(pts_gt, cams_gt, seed=0, noise=0.4, perturb=True,
                  n_fixed=2, bf=0.0, stereo=False):
    rng = np.random.default_rng(seed)
    C, P = len(cams_gt), len(pts_gt)
    e_cam, e_pt, e_obs, e_st = [], [], [], []
    for c in range(C):
        uv, z = project(cams_gt[c], pts_gt)
        pc_z = z
        vis = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480) & (z > 0.2)
        for pi in np.where(vis)[0]:
            u, v = uv[pi] + rng.normal(0, noise, 2)
            ur = u - bf / pc_z[pi] if stereo else 0.0
            e_cam.append(c)
            e_pt.append(pi)
            e_obs.append([u, v, ur])
            e_st.append(stereo)
    E = len(e_cam)
    Epad = int(np.ceil(E / 256) * 256)
    pad = Epad - E

    if perturb:
        cams = np.stack([
            np.asarray(se3.compose(se3.se3_exp(jnp.asarray(
                np.concatenate([rng.normal(0, 0.03, 3), rng.normal(0, 0.01, 3)]).astype(np.float32))),
                jnp.asarray(cams_gt[c]))) if c >= n_fixed else cams_gt[c]
            for c in range(C)])
        pts = pts_gt + rng.normal(0, 0.05, pts_gt.shape).astype(np.float32)
    else:
        cams, pts = cams_gt.copy(), pts_gt.copy()

    prob = BA.BAProblem(
        cam_T=jnp.asarray(cams),
        cam_fixed=jnp.asarray(np.arange(C) < n_fixed),
        cam_valid=jnp.ones(C, bool),
        pts=jnp.asarray(pts),
        pt_valid=jnp.ones(P, bool),
        e_cam=jnp.asarray(np.array(e_cam + [0] * pad, np.int32)),
        e_pt=jnp.asarray(np.array(e_pt + [0] * pad, np.int32)),
        e_obs=jnp.asarray(np.array(e_obs + [[0, 0, 0]] * pad, np.float32)),
        e_stereo=jnp.asarray(np.array(e_st + [False] * pad)),
        e_info=jnp.ones(Epad, jnp.float32),
        e_valid=jnp.asarray(np.array([True] * E + [False] * pad)),
    )
    return prob


class TestSchurBA:
    def test_mono_local_ba_converges(self):
        pts_gt, cams_gt = make_scene(seed=5)
        prob = build_problem(pts_gt, cams_gt, seed=6)
        res = BA.ba_solve(prob, FX, FY, CX, CY, 0.0)
        # camera poses recovered
        for c in range(2, len(cams_gt)):
            err = np.asarray(se3.se3_log(se3.compose(
                res.cam_T[c], se3.inverse(jnp.asarray(cams_gt[c])))))
            assert np.abs(err).max() < 5e-3, (c, err)
        pt_err = np.linalg.norm(np.asarray(res.pts) - pts_gt, axis=-1)
        # noise floor: 0.4px obs noise at z~7m, ~1.5m total baseline -> ~3cm
        assert np.median(pt_err) < 0.04
        ev = np.asarray(prob.e_valid)
        assert np.asarray(res.e_inlier)[ev].mean() > 0.95

    def test_outlier_edges_cut(self):
        pts_gt, cams_gt = make_scene(seed=7)
        prob = build_problem(pts_gt, cams_gt, seed=8)
        # corrupt 5% of edges
        rng = np.random.default_rng(9)
        E = int(np.asarray(prob.e_valid).sum())
        bad = rng.choice(E, E // 20, replace=False)
        obs = np.array(prob.e_obs)
        obs[bad, :2] += rng.uniform(20, 80, (len(bad), 2))
        prob = prob._replace(e_obs=jnp.asarray(obs))
        res = BA.ba_solve(prob, FX, FY, CX, CY, 0.0)
        inl = np.asarray(res.e_inlier)
        assert inl[bad].mean() < 0.1
        for c in range(2, len(cams_gt)):
            err = np.asarray(se3.se3_log(se3.compose(
                res.cam_T[c], se3.inverse(jnp.asarray(cams_gt[c])))))
            assert np.abs(err).max() < 8e-3, (c, err)

    def test_stereo_ba(self):
        bf = 0.3 * FX
        pts_gt, cams_gt = make_scene(seed=10)
        prob = build_problem(pts_gt, cams_gt, seed=11, bf=bf, stereo=True, n_fixed=1)
        res = BA.ba_solve(prob, FX, FY, CX, CY, bf)
        for c in range(1, len(cams_gt)):
            err = np.asarray(se3.se3_log(se3.compose(
                res.cam_T[c], se3.inverse(jnp.asarray(cams_gt[c])))))
            assert np.abs(err).max() < 5e-3, (c, err)

    def test_fixed_cameras_untouched(self):
        pts_gt, cams_gt = make_scene(seed=12, n_cams=4)
        prob = build_problem(pts_gt, cams_gt, seed=13)
        res = BA.ba_solve(prob, FX, FY, CX, CY, 0.0)
        np.testing.assert_array_equal(np.asarray(res.cam_T[:2]), cams_gt[:2])

    def test_dense_schur_matches_cg(self):
        """The materialized-Schur Cholesky path (single-device fast path)
        and the matrix-free PCG path (sharded formulation) solve the same
        normal equations: same inlier set, same poses to sub-mm."""
        pts_gt, cams_gt = make_scene(seed=20, n_cams=8)
        prob = build_problem(pts_gt, cams_gt, seed=21)
        r_cg = BA.ba_solve(prob, FX, FY, CX, CY, 0.0, solver="cg")
        r_dn = BA.ba_solve(prob, FX, FY, CX, CY, 0.0, solver="dense")
        np.testing.assert_array_equal(np.asarray(r_cg.e_inlier),
                                      np.asarray(r_dn.e_inlier))
        assert abs(float(r_cg.cost) - float(r_dn.cost)) < 1e-2 * max(
            1.0, float(r_cg.cost))
        np.testing.assert_allclose(np.asarray(r_cg.cam_T),
                                   np.asarray(r_dn.cam_T), atol=5e-4)
        # stereo variant exercises the 3-row residual blocks
        prob_s = build_problem(pts_gt, cams_gt, seed=22, stereo=True, bf=250.0)
        r_cg = BA.ba_solve(prob_s, FX, FY, CX, CY, 250.0, solver="cg")
        r_dn = BA.ba_solve(prob_s, FX, FY, CX, CY, 250.0, solver="dense")
        np.testing.assert_allclose(np.asarray(r_cg.cam_T),
                                   np.asarray(r_dn.cam_T), atol=5e-4)
