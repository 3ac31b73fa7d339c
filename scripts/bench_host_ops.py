"""Host-side map-bookkeeping scaling: per-keyframe mapping-stage host time
must stay flat(ish) in map size up to 500 keyframes (VERDICT r1 item 9).

Measures, at K = 50 / 150 / 300 / 500 keyframes with proportional points:
- covisibility_weights (single KF, native kernel)
- covis_matrix (full [K,K] pass, pose-graph edge construction)
- refresh_point_stats over one keyframe's bound points (vectorized)
- point_obs_count + observations_of (the kf_pt sweeps)

Usage: python scripts/bench_host_ops.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")

from orbslam2_tpu.config import SlamConfig
from orbslam2_tpu.map.mapstate import MapState


def build(K, pts_per_kf=300, n_feat=1024, seed=0):
    rng = np.random.default_rng(seed)
    P = K * 60 + 2000
    cfg = SlamConfig(max_keyframes=max(K + 8, 512),
                     max_points=max(P + 1024, 65536))
    mp = MapState(cfg, n_feat)
    pts = mp.add_points(rng.uniform(-5, 5, (P, 3)).astype(np.float32),
                        rng.integers(0, 2**32, (P, 8), dtype=np.uint32), 0, 0)
    for k in range(K):
        pose = np.hstack([np.eye(3), rng.normal(0, 1, (3, 1))]).astype(np.float32)
        pt_idx = np.full(n_feat, -1, np.int32)
        # local visibility: each KF sees a contiguous band of points
        lo = int(k * 60)
        sel = rng.choice(np.arange(lo, min(lo + 1200, P)),
                         min(pts_per_kf, 1200), replace=False)
        pt_idx[:len(sel)] = pts[sel]
        mp.add_keyframe(pose, float(k), k,
                        rng.uniform(0, 640, (n_feat, 2)).astype(np.float32),
                        rng.integers(0, 8, n_feat).astype(np.int32),
                        np.zeros(n_feat, np.float32),
                        rng.integers(0, 2**32, (n_feat, 8), dtype=np.uint32),
                        np.ones(n_feat, bool), pt_idx)
    return mp, pts


def t(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("| K keyframes | covis_weights ms | covis_matrix ms | "
          "refresh_point_stats ms | point_obs_count ms |")
    print("|---|---|---|---|---|")
    for K in (50, 150, 300, 500):
        mp, pts = build(K)
        k = K - 1
        bound = mp.kf_pt[k][mp.kf_pt[k] >= 0]
        ms_w = t(lambda: mp.covisibility_weights(k))
        ms_m = t(lambda: mp.covis_matrix(), n=3)
        ms_r = t(lambda: mp.refresh_point_stats(np.unique(bound)))
        ms_o = t(lambda: mp.point_obs_count())
        print(f"| {K} | {ms_w:.2f} | {ms_m:.2f} | {ms_r:.2f} | {ms_o:.2f} |",
              flush=True)


if __name__ == "__main__":
    main()
