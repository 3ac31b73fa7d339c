"""KITTI-scale keyframe lifecycle (VERDICT r2 item 6).

The map's capacity now GROWS (array doubling, stable ids) instead of
raising "keyframe capacity exhausted" at max_keyframes-ever-created, and
keyframe culling REPARENTS children in the spanning tree (the reference's
greedy loop, src/KeyFrame.cpp:567-660) so GBA late-KF correction and PGO
edge chains stay connected as the map ages.
"""
import numpy as np
import pytest

from orbslam2_tpu.config import SlamConfig, Sensor
from orbslam2_tpu.map.mapstate import MapState


def _add_kf(mp, i, pt_ids, n_obs=40):
    """Minimal keyframe observing a window of points (consecutive KFs share
    most of their points -> covisibility chain)."""
    n = mp.n_feat
    T = np.hstack([np.eye(3), [[0.1 * i], [0.0], [0.0]]]).astype(np.float32)
    pt_idx = np.full(n, -1, np.int32)
    sel = pt_ids[np.arange(i, i + n_obs) % len(pt_ids)]
    pt_idx[:n_obs] = sel
    k = mp.add_keyframe(T, float(i), i, np.zeros((n, 2), np.float32),
                        np.zeros(n, np.int32), np.zeros(n, np.float32),
                        np.zeros((n, 8), np.uint32), np.arange(n) < n_obs,
                        pt_idx)
    if k > 0:
        mp.kf_parent[k] = k - 1 if mp.kf_valid[k - 1] else int(mp.kf_ids[-2])
    return k


@pytest.mark.slow
class TestKeyframeLifecycle:
    def test_1500_keyframes_with_culling(self):
        cfg = SlamConfig(sensor=Sensor.MONOCULAR, max_keyframes=64,
                         max_points=1024)
        mp = MapState(cfg, 64)
        rng = np.random.default_rng(0)
        pt_ids = mp.add_points(
            rng.uniform(-1, 1, (256, 3)).astype(np.float32),
            np.zeros((256, 8), np.uint32), ref_kf=0, first_kf=0)

        n_created = 1600
        culled = []
        for i in range(n_created):
            k = _add_kf(mp, i, pt_ids)
            # cull an older keyframe every third insertion (keeps ~2/3)
            if i % 3 == 2 and i > 4:
                victim = k - 2
                if mp.kf_valid[victim]:
                    mp.remove_keyframe(victim)
                    culled.append(victim)

        assert mp.next_kf_id == n_created
        assert mp.kf_valid.shape[0] >= n_created  # capacity grew
        assert len(culled) > 400

        # spanning tree: every live KF's parent is live (reparenting held),
        # and every parent chain terminates at the root without cycles
        ids = mp.kf_ids
        for k in ids:
            p = int(mp.kf_parent[k])
            if p >= 0:
                assert mp.kf_valid[p], f"kf {k} parented to culled {p}"
            seen = set()
            cur = int(k)
            while cur >= 0:
                assert cur not in seen, f"parent cycle at {cur}"
                seen.add(cur)
                cur = int(mp.kf_parent[cur])
            assert len(seen) <= len(ids)

        # culled keyframes stay trajectory-recoverable through the retired
        # anchor chain
        for k in culled[:50]:
            T = mp.resolve_kf_pose(k)
            assert T is not None and np.isfinite(T).all()

    def test_point_capacity_growth(self):
        cfg = SlamConfig(sensor=Sensor.MONOCULAR, max_keyframes=8,
                         max_points=128)
        mp = MapState(cfg, 64)
        rng = np.random.default_rng(1)
        all_ids = []
        for _ in range(10):
            ids = mp.add_points(rng.uniform(-1, 1, (50, 3)).astype(np.float32),
                                np.zeros((50, 8), np.uint32),
                                ref_kf=0, first_kf=0)
            all_ids.append(ids)
        ids = np.concatenate(all_ids)
        assert len(np.unique(ids)) == 500  # stable, distinct ids
        assert mp.pt_valid[ids].all()
        assert mp.pt_valid.shape[0] >= 500
