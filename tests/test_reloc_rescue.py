"""Relocalization projective-rescue rounds (src/Tracking.cpp:1908-1950).

Constructs a map + query frame where BoW descriptor matching alone yields
~40 inliers — below the reference's 50-inlier acceptance gate — while a
further ~30 correspondences are only reachable by projecting the candidate
keyframe's points with the estimated pose and matching under the looser
ORBdist=100 gate (their descriptors are corrupted past TH_LOW=50 but under
100). The reference rescues exactly these (SearchByProjection(cur, KF,
found, 10, 100), src/ORBmatcher.cpp:1723); without the rescue the
relocalization must fail.
"""
import numpy as np
import pytest

from orbslam2_tpu.config import SlamConfig, Sensor, with_camera
from orbslam2_tpu.frontend.frame import Frame
from orbslam2_tpu.map.keyframe_db import KeyFrameDatabase
from orbslam2_tpu.map.mapstate import MapState
from orbslam2_tpu.relocalization import Relocalizer
from orbslam2_tpu.io.vocabulary import Vocabulary
from orbslam2_tpu.system import DEFAULT_VOCAB


def _flip_bits(desc: np.ndarray, n_bits: int, rng) -> np.ndarray:
    """Flip exactly n_bits of a [8] uint32 (256-bit) descriptor."""
    bits = np.unpackbits(desc.view(np.uint8))
    idx = rng.choice(256, n_bits, replace=False)
    bits[idx] ^= 1
    return np.packbits(bits).view(np.uint32)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    cfg = with_camera(SlamConfig(sensor=Sensor.MONOCULAR),
                      fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                      width=640, height=480)
    n = 128
    mp = MapState(cfg, n)
    voc = Vocabulary.load(DEFAULT_VOCAB)
    db = KeyFrameDatabase(cfg, mp, voc.n_words)
    reloc = Relocalizer(cfg, mp, voc, db)

    # 80 world points in front of the origin camera
    n_pts = 80
    X = np.stack([rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
                  rng.uniform(4, 8, n_pts)], -1).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
    pt_ids = mp.add_points(X, desc, ref_kf=0, first_kf=0)

    T_kf = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    uv_kf = _project(cfg.camera, T_kf, X)
    pt_of = np.full(n, -1, np.int32)
    pt_of[:n_pts] = pt_ids
    xy = np.zeros((n, 2), np.float32)
    xy[:n_pts] = uv_kf
    k = mp.add_keyframe(T_kf, 0.0, 0, xy, np.zeros(n, np.int32),
                        np.zeros(n, np.float32), _pad_desc(desc, n),
                        np.arange(n) < n_pts, pt_of)
    # exact scale band around the true observation distance -> predicted
    # level 0, band gates pass
    dist = np.linalg.norm(X, axis=-1)
    mp.pt_max_dist[pt_ids] = dist
    mp.pt_min_dist[pt_ids] = dist / 10.0
    mp.pt_normal[pt_ids] = X / dist[:, None]
    vec, nodes = reloc.frame_bow(mp.kf_desc[k], mp.kf_feat_valid[k])
    mp.kf_bow_node[k] = nodes
    db.add(k, vec)
    return cfg, mp, reloc, X, desc, pt_ids, k, rng


def _project(cam, T, X):
    Xc = X @ T[:, :3].T + T[:, 3]
    return np.stack([cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx,
                     cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy],
                    -1).astype(np.float32)


def _pad_desc(desc, n):
    out = np.zeros((n, 8), np.uint32)
    out[:len(desc)] = desc
    return out


def _query_frame(setup_vals):
    cfg, mp, reloc, X, desc, pt_ids, k, rng = setup_vals
    n = 128
    n_pts = len(X)
    # query pose: small offset from the keyframe
    T_q = np.hstack([np.eye(3),
                     np.array([[0.05], [0.02], [0.0]], np.float32)]
                    ).astype(np.float32)
    uv = _project(cfg.camera, T_q, X)
    qdesc = desc.copy()
    # features 35..70: corrupted past TH_LOW (BoW match fails) but inside
    # ORBdist=100 (rescue succeeds) — leaves 45 clean matches, below the
    # 50-inlier acceptance gate
    for i in range(35, 70):
        qdesc[i] = _flip_bits(desc[i].copy(), 70, rng)
    frame = Frame(
        frame_id=100, timestamp=1.0,
        xy=_pad_xy(uv, n), xy_raw=_pad_xy(uv, n),
        octave=np.zeros(n, np.int32), angle=np.zeros(n, np.float32),
        response=np.ones(n, np.float32), desc=_pad_desc(qdesc, n),
        valid=np.arange(n) < n_pts, depth=np.full(n, -1.0, np.float32),
        ur=np.full(n, -1.0, np.float32))
    return frame, T_q


def _pad_xy(uv, n):
    out = np.zeros((n, 2), np.float32)
    out[:len(uv)] = uv
    return out


def test_rescue_reaches_50_gate(setup):
    frame, T_q = _query_frame(setup)
    cfg, mp, reloc = setup[0], setup[1], setup[2]
    ok = reloc.relocalize(frame)
    assert ok, "rescue rounds should push a 40-inlier reloc past the 50 gate"
    n_bound = int((frame.pt_idx >= 0).sum())
    assert n_bound >= 50, f"only {n_bound} bindings after rescue"
    # recovered translation close to the query pose (exact correspondences)
    assert np.allclose(frame.pose[:, 3], T_q[:, 3], atol=0.02)


def test_without_rescue_fails(setup, monkeypatch):
    frame, _ = _query_frame(setup)
    reloc = setup[2]
    monkeypatch.setattr(type(reloc), "_rescue",
                        lambda self, *a, **kw: 0)
    assert not reloc.relocalize(frame), \
        "40 BoW inliers must NOT pass the 50-inlier gate without rescue"
