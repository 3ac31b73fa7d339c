"""Guided SearchBySim3 expansion (loop_closing._search_by_sim3).

The reference inserts a bidirectional Sim3-guided search between the Sim3
RANSAC and its GN refinement (src/ORBmatcher.cpp:1305-1560, called at
src/LoopClosing.cpp:402): descriptor-ambiguous correspondences that the
global ratio test throws away are recovered by the spatial gate, roughly
doubling the refinement's correspondence set on marginal loops.
"""
import numpy as np
import pytest

from orbslam2_tpu.config import SlamConfig, Sensor, with_camera
from orbslam2_tpu.loop_closing import LoopCloser
from orbslam2_tpu.map.mapstate import MapState


def _build_two_kf_map(n_unique=22, n_dup_pairs=40, seed=0):
    """Two keyframes at the same pose observing the same physical scene
    through SEPARATE map-point copies (the loop situation). The first
    n_unique points carry distinct descriptors; the remaining points come
    in pairs sharing a descriptor, so a global ratio test rejects them
    while a position-gated search disambiguates."""
    rng = np.random.default_rng(seed)
    cfg = with_camera(SlamConfig(sensor=Sensor.RGBD, max_keyframes=8,
                                 max_points=2048),
                      fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                      width=640, height=480, bf=40.0)
    cam = cfg.camera
    n_pts = n_unique + 2 * n_dup_pairs
    X = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
                  rng.uniform(4, 8, n_pts)], -1).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
    # duplicate descriptors pairwise among the tail points
    for i in range(n_dup_pairs):
        desc[n_unique + 2 * i + 1] = desc[n_unique + 2 * i]

    mp = MapState(cfg, 256)
    T = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)

    def add_kf(pt_ids):
        n = mp.n_feat
        uv = np.stack([cam.fx * X[:, 0] / X[:, 2] + cam.cx,
                       cam.fy * X[:, 1] / X[:, 2] + cam.cy], -1)
        xy = np.zeros((n, 2), np.float32)
        xy[:n_pts] = uv
        pt_idx = np.full(n, -1, np.int32)
        pt_idx[:n_pts] = pt_ids
        k = mp.add_keyframe(T.copy(), 0.0, 0, xy, np.zeros(n, np.int32),
                            np.zeros(n, np.float32),
                            np.concatenate([desc, np.zeros((n - n_pts, 8),
                                                           np.uint32)]),
                            np.arange(n) < n_pts, pt_idx)
        return k

    ids1 = mp.add_points(X, desc, ref_kf=0, first_kf=0)
    ids2 = mp.add_points(X.copy(), desc.copy(), ref_kf=1, first_kf=1)
    k1 = add_kf(ids1)
    k2 = add_kf(ids2)
    mp.refresh_point_stats(np.concatenate([ids1, ids2]))
    return cfg, mp, k1, k2, n_unique, n_pts


class TestSearchBySim3:
    def test_expands_ambiguous_matches(self):
        cfg, mp, k1, k2, n_unique, n_pts = _build_two_kf_map()
        lc = LoopCloser(cfg, mp, kf_db=None, local_mapper=None)
        # seed set: only the unique-descriptor features (what a ratio test
        # would deliver)
        i1 = np.arange(n_unique)
        i2 = np.arange(n_unique)
        e1, e2 = lc._search_by_sim3(k1, k2, 1.0, np.eye(3),
                                    np.zeros(3), i1, i2)
        assert len(e1) > n_unique + 0.6 * (n_pts - n_unique), (
            f"guided expansion recovered only {len(e1) - n_unique} of "
            f"{n_pts - n_unique} ambiguous pairs")
        # every recovered pair must be geometrically correct: same feature
        # slot on both sides (the two KFs share the projection layout)
        extra1, extra2 = e1[n_unique:], e2[n_unique:]
        assert (extra1 == extra2).all()

    def test_mutual_agreement_required(self):
        """A Sim3 that throws direction 1->2 projections far off must yield
        no expansion (the bidirectional agreement gate)."""
        cfg, mp, k1, k2, n_unique, n_pts = _build_two_kf_map()
        lc = LoopCloser(cfg, mp, kf_db=None, local_mapper=None)
        i1 = np.arange(n_unique)
        R_wrong = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])  # 90deg
        e1, e2 = lc._search_by_sim3(k1, k2, 1.0, R_wrong,
                                    np.zeros(3), i1, i1)
        assert len(e1) == n_unique
