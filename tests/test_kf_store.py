"""KFStore: the device-resident cache of immutable keyframe feature tensors
(local_mapping.KFStore). Covers first-sync, capacity growth tracking, and
the kf_frame_id fingerprint that catches slot recycling after a cull."""
import numpy as np
import pytest

from orbslam2_tpu.config import SlamConfig
from orbslam2_tpu.local_mapping import KFStore
from orbslam2_tpu.map.mapstate import MapState


def _add_kf(mp, frame_id, fill):
    n = mp.n_feat
    rng = np.random.default_rng(fill)
    return mp.add_keyframe(
        pose=np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32),
        timestamp=float(frame_id), frame_id=frame_id,
        xy=rng.uniform(0, 100, (n, 2)).astype(np.float32),
        octave=np.full(n, fill % 8, np.int32),
        angle=np.zeros(n, np.float32),
        desc=np.full((n, 8), fill, np.uint32),
        feat_valid=np.ones(n, bool),
        pt_idx=np.full(n, -1, np.int32),
        patch=np.full((n, 15, 15), fill % 251, np.float32),
        xy0=np.full((n, 2), float(fill), np.float32))


@pytest.fixture
def mp():
    from dataclasses import replace
    cfg = replace(SlamConfig(), max_keyframes=4, max_points=64)
    return MapState(cfg, n_feat=32)


def test_rows_sync_once_and_serve_gathers(mp):
    store = KFStore(mp)
    k0 = _add_kf(mp, frame_id=10, fill=3)
    k1 = _add_kf(mp, frame_id=11, fill=7)
    xy0, octv, desc, patch = store.ensure([k0, k1])
    assert np.all(np.asarray(desc[k0]) == 3)
    assert np.all(np.asarray(desc[k1]) == 7)
    assert np.all(np.asarray(patch[k1]) == 7)
    assert np.all(np.asarray(xy0[k0]) == 3.0)
    # second ensure is a no-op (fingerprints match) and returns same data
    xy0b, _, descb, _ = store.ensure([k0, k1])
    assert np.all(np.asarray(descb[k0]) == 3)


def test_row_overwrite_resyncs(mp):
    """KF slots are monotonic in normal operation, but load_map/reset can
    repopulate a slot with a different keyframe; the kf_frame_id
    fingerprint must catch the overwrite and re-upload."""
    store = KFStore(mp)
    k0 = _add_kf(mp, frame_id=10, fill=3)
    store.ensure([k0])
    # repopulate the slot as load_map would
    mp.kf_frame_id[k0] = 99
    mp.kf_desc[k0] = 42
    mp.kf_patch[k0] = 42
    _, _, desc, patch = store.ensure([k0])
    assert np.all(np.asarray(desc[k0]) == 42), \
        "stale row served after slot overwrite"
    assert np.all(np.asarray(patch[k0]) == 42)


def test_growth_tracks_host_capacity(mp):
    store = KFStore(mp)
    ks = [_add_kf(mp, frame_id=i, fill=i + 1) for i in range(3)]
    store.ensure(ks)
    # force host growth past the initial n_kf=4 capacity
    more = [_add_kf(mp, frame_id=100 + i, fill=50 + i) for i in range(6)]
    _, _, desc, _ = store.ensure(more + ks)
    assert desc.shape[0] == mp.kf_xy0.shape[0]
    assert np.all(np.asarray(desc[more[-1]]) == 55)
    assert np.all(np.asarray(desc[ks[0]]) == 1), "old rows survived growth"
