import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import se3, sim3
from orbslam2_tpu.ops import sim3_solver as S3
from orbslam2_tpu.ops import pose_graph as PG


class TestSim3Solver:
    def make_pair(self, seed=0, s_gt=1.4, n=100, noise=0.0, n_out=0):
        rng = np.random.default_rng(seed)
        P2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                       rng.uniform(3, 8, n)], -1).astype(np.float32)
        R_gt = np.asarray(se3.so3_exp(jnp.asarray([0.1, -0.2, 0.15])))
        t_gt = np.array([0.4, -0.1, 0.3], np.float32)
        P1 = s_gt * P2 @ R_gt.T + t_gt
        P1 += rng.normal(0, noise, P1.shape)
        if n_out:
            idx = rng.choice(n, n_out, replace=False)
            P1[idx] += rng.uniform(1, 3, (n_out, 3))
        return P1.astype(np.float32), P2, s_gt, R_gt, t_gt

    def test_exact_recovery(self):
        P1, P2, s_gt, R_gt, t_gt = self.make_pair()
        res = S3.sim3_ransac(jax.random.PRNGKey(0), jnp.asarray(P1), jnp.asarray(P2),
                             jnp.ones(len(P1)), jnp.ones(len(P1)),
                             jnp.ones(len(P1), bool), 500., 500., 320., 240.)
        assert abs(float(res.s) - s_gt) < 0.01
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=1e-2)
        assert int(res.n_inliers) > 90

    def test_outlier_rejection(self):
        P1, P2, s_gt, R_gt, t_gt = self.make_pair(seed=1, noise=0.005, n_out=25)
        res = S3.sim3_ransac(jax.random.PRNGKey(1), jnp.asarray(P1), jnp.asarray(P2),
                             jnp.ones(len(P1)), jnp.ones(len(P1)),
                             jnp.ones(len(P1), bool), 500., 500., 320., 240.)
        assert abs(float(res.s) - s_gt) < 0.05
        assert int(res.n_inliers) >= 60

    def test_fix_scale(self):
        P1, P2, s_gt, R_gt, t_gt = self.make_pair(seed=2, s_gt=1.0)
        res = S3.sim3_ransac(jax.random.PRNGKey(2), jnp.asarray(P1), jnp.asarray(P2),
                             jnp.ones(len(P1)), jnp.ones(len(P1)),
                             jnp.ones(len(P1), bool), 500., 500., 320., 240.,
                             fix_scale=True)
        assert float(res.s) == 1.0
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=1e-3)


class TestPoseGraph:
    def test_loop_drift_correction(self):
        """Classic loop: chain of keyframes with accumulated drift; a loop
        edge to the start pulls everything back (the CorrectLoop workload,
        src/Optimizer.cpp:944)."""
        K = 12
        rng = np.random.default_rng(0)
        # ground-truth poses on a circle
        gt = []
        for i in range(K):
            a = 2 * np.pi * i / K
            Rwc = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                            [-np.sin(a), 0, np.cos(a)]], np.float32)
            C = np.array([np.sin(a), 0.0, 1 - np.cos(a)], np.float32) * 2
            Rcw = Rwc.T
            gt.append({"s": np.float32(1.0), "R": Rcw, "t": -Rcw @ C})
        # odometry edges with drift: measured relative = true relative + noise
        e_i, e_j, ms, mR, mt = [], [], [], [], []

        def rel(a, b):  # S_a ∘ S_b^-1
            Sa = {k: jnp.asarray(v) for k, v in gt[a].items()}
            Sb = {k: jnp.asarray(v) for k, v in gt[b].items()}
            return sim3.compose(Sa, sim3.inverse(Sb))

        drift = np.concatenate([rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3),
                                [0.015]])  # per-step drift incl. scale
        for i in range(1, K):
            m = rel(i, i - 1)
            # corrupt the measurement consistently to simulate drift
            D = sim3.exp(jnp.asarray(drift, jnp.float32))
            m = sim3.compose(D, m)
            e_i.append(i); e_j.append(i - 1)
            ms.append(float(m["s"])); mR.append(np.asarray(m["R"])); mt.append(np.asarray(m["t"]))
        # loop edge: exact measurement from last to first
        m = rel(K - 1, 0)
        e_i.append(K - 1); e_j.append(0)
        ms.append(float(m["s"])); mR.append(np.asarray(m["R"])); mt.append(np.asarray(m["t"]))

        # initial estimates: integrate the drifty odometry
        est = [dict(gt[0])]
        for i in range(1, K):
            Sm = {"s": jnp.asarray(ms[i - 1]), "R": jnp.asarray(mR[i - 1]),
                  "t": jnp.asarray(mt[i - 1])}
            Sprev = {k: jnp.asarray(v) for k, v in est[i - 1].items()}
            Si = sim3.compose(Sm, Sprev)
            est.append({"s": np.float32(Si["s"]), "R": np.asarray(Si["R"]),
                        "t": np.asarray(Si["t"])})

        svals = jnp.asarray(np.array([e["s"] for e in est]))
        R = jnp.asarray(np.stack([e["R"] for e in est]))
        t = jnp.asarray(np.stack([e["t"] for e in est]))
        fixed = jnp.asarray(np.arange(K) == 0)
        E = len(e_i)

        def drift_err(sv, Rv, tv):
            # compare last vertex to ground truth
            Sg = {k: jnp.asarray(v) for k, v in gt[K - 1].items()}
            Se = {"s": sv[K - 1], "R": Rv[K - 1], "t": tv[K - 1]}
            d = sim3.log(sim3.compose(Se, sim3.inverse(Sg)))
            return float(jnp.abs(d).max())

        before = drift_err(svals, R, t)
        sv2, R2, t2, costs = PG.optimize_pose_graph(
            svals, R, t, fixed,
            jnp.asarray(np.array(e_i, np.int32)), jnp.asarray(np.array(e_j, np.int32)),
            jnp.asarray(np.array(ms, np.float32)), jnp.asarray(np.stack(mR)),
            jnp.asarray(np.stack(mt)), jnp.ones(E, bool), iters=20)
        after = drift_err(sv2, R2, t2)
        assert np.isfinite(np.asarray(costs)).all()
        assert after < before * 0.35, (before, after)
        # cost decreased
        c = np.asarray(costs)
        assert c[-1] < c[0] * 0.5


class TestOptimizeSim3:
    def test_refines_noisy_init(self):
        import jax.numpy as jnp
        from orbslam2_tpu.ops.sim3_solver import optimize_sim3
        rng = np.random.default_rng(11)
        n = 128
        P2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                       rng.uniform(3, 8, n)], -1).astype(np.float32)
        R_gt = np.asarray(se3.so3_exp(jnp.asarray([0.05, -0.1, 0.07])))
        t_gt = np.array([0.3, -0.1, 0.2], np.float32)
        s_gt = 1.25
        P1 = (s_gt * P2 @ R_gt.T + t_gt).astype(np.float32)

        def proj(P):
            return np.stack([500 * P[:, 0] / P[:, 2] + 320,
                             500 * P[:, 1] / P[:, 2] + 240], -1).astype(np.float32)

        uv1 = proj(P1) + rng.normal(0, 0.3, (n, 2)).astype(np.float32)
        uv2 = proj(P2) + rng.normal(0, 0.3, (n, 2)).astype(np.float32)
        # noisy init
        R0 = np.asarray(se3.so3_exp(jnp.asarray([0.07, -0.08, 0.05])))
        s, R, t, inl, n_inl = optimize_sim3(
            jnp.asarray(1.1, jnp.float32), jnp.asarray(R0.astype(np.float32)),
            jnp.asarray(t_gt + [0.05, -0.03, 0.02]),
            jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
            jnp.ones(n, bool), 500., 500., 320., 240.)
        assert abs(float(s) - s_gt) < 0.02, float(s)
        assert np.abs(np.asarray(R) - R_gt).max() < 0.01
        assert int(n_inl) > 110
