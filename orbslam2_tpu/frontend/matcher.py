"""Jitted per-frame matching programs used by the tracker.

Each function here is one device dispatch per frame, fusing the reference's
pointer-chasing search loops into dense masked kernels:

- `match_motion_model`  <- ORBmatcher::SearchByProjection(cur, last, th)
  (src/ORBmatcher.cpp:1564-1721)
- `match_local_points`  <- Frame::isInFrustum (src/Frame.cpp:307-386) fused
  with ORBmatcher::SearchByProjection(F, vpMapPoints, th)
  (src/ORBmatcher.cpp:63-219) — frustum test, view-cos radius, predicted
  scale, masked Hamming argmin
- `match_by_bow` <- ORBmatcher::SearchByBoW(KF, F)
  (src/ORBmatcher.cpp:220-369) WITH the reference's FeatureVector node
  gate (depth-2 vocabulary nodes, stored per keyframe at registration) —
  used for loop pairing and relocalization. `match_descriptors_ratio` is
  the ungated form for callers without node ids (mono init reference
  matching, tracker reference-KF fallback, cross-map alignment).
  Ratio 0.7 + rotation consistency as in the reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import matching as M

BIG = M.BIG


def motion_model_core(T, pts_xyz, pt_valid, pt_desc, pt_last_octave, pt_angle,
                      kp_xy, kp_octave, kp_desc, kp_valid, kp_angle, kp_ur,
                      scale_factors, fx, fy, cx, cy, bf, radius_th):
    """Traced core of the motion-model search: project last frame's points
    with the predicted pose and match around the projections (radius
    th * scale(last octave), level window — src/ORBmatcher.cpp:1627-1634),
    with the stereo right-u agreement gate (:1636-1642) and the rotation-
    histogram consistency check (:1672-1696).

    Computes the Hamming matrix ONCE and evaluates both the base radius and
    the 2x widened retry (src/Tracking.cpp:1192-1196), selecting the widened
    result when the base search finds < 20 matches — the fused-frame
    equivalent of the reference's sequential retry."""
    R, t = T[:, :3], T[:, 3]
    pc = pts_xyz @ R.T + t
    z = pc[:, 2]
    ok = pt_valid & (z > 0.1)
    iz = 1.0 / jnp.maximum(z, 1e-6)
    uv = jnp.stack([fx * pc[:, 0] * iz + cx, fy * pc[:, 1] * iz + cy], -1)
    ur_pred = uv[:, 0] - bf * iz
    sf = jnp.asarray(scale_factors)
    r_base = sf[jnp.clip(pt_last_octave, 0, sf.shape[0] - 1)] * radius_th
    duv_x = jnp.abs(uv[:, 0:1] - kp_xy[None, :, 0])
    duv_y = jnp.abs(uv[:, 1:2] - kp_xy[None, :, 1])
    dur = jnp.abs(ur_pred[:, None] - kp_ur[None, :])
    lv_ok = (kp_octave[None, :] >= pt_last_octave[:, None] - 1) & (
        kp_octave[None, :] <= pt_last_octave[:, None] + 1)
    base = lv_ok & ok[:, None] & kp_valid[None, :]
    dist = M.hamming_matrix(pt_desc, kp_desc)

    def at_radius(r):
        cand = base & (duv_x <= r[:, None]) & (duv_y <= r[:, None]) & (
            (kp_ur[None, :] < 0) | (dur <= r[:, None]))
        res = M.masked_best_match(dist, cand, M.TH_HIGH, 0.9)
        rot_ok = M.rotation_consistency(pt_angle, kp_angle, res.idx, res.valid)
        res = M.MatchResult(jnp.where(rot_ok, res.idx, -1),
                            jnp.where(rot_ok, res.dist, BIG))
        res = M.resolve_duplicate_targets(res, kp_xy.shape[0])
        return res, jnp.sum(res.idx >= 0)

    res_n, n_n = at_radius(r_base)
    res_w, n_w = at_radius(2.0 * r_base)
    wide = n_n < 20
    res = M.MatchResult(jnp.where(wide, res_w.idx, res_n.idx),
                        jnp.where(wide, res_w.dist, res_n.dist))
    return res, jnp.where(wide, n_w, n_n)


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "bf",
                                             "radius_th", "n_levels",
                                             "log_scale"))
def match_motion_model(T, pts_xyz, pt_valid, pt_desc, pt_last_octave, pt_angle,
                       kp_xy, kp_octave, kp_desc, kp_valid, kp_angle, kp_ur,
                       scale_factors, fx: float, fy: float, cx: float,
                       cy: float, bf: float, radius_th: float, n_levels: int,
                       log_scale: float):
    """Single-radius motion-model search (the standalone per-stage dispatch;
    the fused frame program uses motion_model_core's dual-radius form)."""
    R, t = T[:, :3], T[:, 3]
    pc = pts_xyz @ R.T + t
    z = pc[:, 2]
    ok = pt_valid & (z > 0.1)
    iz = 1.0 / jnp.maximum(z, 1e-6)
    uv = jnp.stack([fx * pc[:, 0] * iz + cx, fy * pc[:, 1] * iz + cy], -1)
    ur_pred = uv[:, 0] - bf * iz
    res = M.search_by_projection(
        uv, pt_last_octave, jnp.full(pts_xyz.shape[0], radius_th), pt_desc, ok,
        kp_xy, kp_octave, kp_desc, kp_valid, scale_factors,
        max_dist=M.TH_HIGH, ratio=0.9, level_window=(-1, 1),
        pt_ur=ur_pred, kp_ur=kp_ur)
    rot_ok = M.rotation_consistency(pt_angle, kp_angle, res.idx, res.valid)
    res = M.MatchResult(jnp.where(rot_ok, res.idx, -1),
                        jnp.where(rot_ok, res.dist, BIG))
    return M.resolve_duplicate_targets(res, kp_xy.shape[0])


def local_points_core(T, pts_xyz, pt_valid, pt_desc, pt_normal,
                      pt_min_dist, pt_max_dist, already_matched,
                      kp_xy, kp_octave, kp_desc, kp_valid, kp_ur,
                      scale_factors, fx, fy, cx, cy, bf, width, height,
                      n_levels, log_scale, radius_th, dedup: bool = True):
    """Traced core of the local-map search (radius_th may be a traced
    scalar — the fused frame program passes the lost-state widening as
    data, not as a recompile).

    dedup=False returns every point's best keypoint WITHOUT the
    one-claimant-per-keypoint reduction — the fuse path needs multiple
    points claiming the same keypoint to surface so the host can MERGE
    them (ORBmatcher::Fuse processes points sequentially and merging on a
    shared feature is the mechanism, src/ORBmatcher.cpp:1091-1113;
    deduping here silently suppressed fuse merges)."""
    R, t = T[:, :3], T[:, 3]
    pc = pts_xyz @ R.T + t
    z = pc[:, 2]
    z_ok = z > 0.1
    iz = 1.0 / jnp.maximum(z, 1e-6)
    uv = jnp.stack([fx * pc[:, 0] * iz + cx, fy * pc[:, 1] * iz + cy], -1)
    ur_pred = uv[:, 0] - bf * iz
    in_img = (uv[:, 0] >= 0) & (uv[:, 0] < width) & (uv[:, 1] >= 0) & (uv[:, 1] < height)
    Ow = -R.T @ t
    po = pts_xyz - Ow[None]
    dist = jnp.linalg.norm(po, axis=-1)
    band = (dist >= 0.8 * pt_min_dist) & (dist <= 1.2 * pt_max_dist)
    viewcos = jnp.sum(po * pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    cos_ok = viewcos > 0.5
    in_frustum = pt_valid & z_ok & in_img & band & cos_ok

    # predicted level (MapPoint::PredictScale, src/MapPoint.cpp:489-530)
    ratio = jnp.maximum(pt_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    pred = jnp.ceil(jnp.log(ratio) / log_scale).astype(jnp.int32)
    pred = jnp.clip(pred, 0, n_levels - 1)

    # view-cos radius (ORBmatcher::RadiusByViewingCos, src/ORBmatcher.cpp:211)
    radius = jnp.where(viewcos > 0.998, 2.5, 4.0) * radius_th

    res = M.search_by_projection(
        uv, pred, radius, pt_desc, in_frustum & ~already_matched,
        kp_xy, kp_octave, kp_desc, kp_valid, scale_factors,
        max_dist=M.TH_HIGH, ratio=0.8, level_window=(-1, 0),
        pt_ur=ur_pred, kp_ur=kp_ur)
    if dedup:
        res = M.resolve_duplicate_targets(res, kp_xy.shape[0])
    return res, in_frustum


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "bf",
                                             "width", "height", "n_levels",
                                             "log_scale", "radius_th"))
def match_local_points(T, pts_xyz, pt_valid, pt_desc, pt_normal,
                       pt_min_dist, pt_max_dist, already_matched,
                       kp_xy, kp_octave, kp_desc, kp_valid, kp_ur,
                       scale_factors, fx: float, fy: float, cx: float,
                       cy: float, bf: float, width: int, height: int,
                       n_levels: int, log_scale: float,
                       radius_th: float = 1.0):
    """Frustum-filter local map points and match them into the frame.

    Returns (MatchResult pt->kp, in_frustum mask) — the in_frustum mask
    drives IncreaseVisible (src/Tracking.cpp:1592-1616)."""
    return local_points_core(
        T, pts_xyz, pt_valid, pt_desc, pt_normal, pt_min_dist, pt_max_dist,
        already_matched, kp_xy, kp_octave, kp_desc, kp_valid, kp_ur,
        scale_factors, fx, fy, cx, cy, bf, width, height, n_levels,
        log_scale, radius_th)


@jax.jit
def match_descriptors_ratio(desc_a, valid_a, angle_a, desc_b, valid_b, angle_b):
    """Global ratio-test matching a->b (the SearchByBoW work without the
    vocabulary gating), TH_LOW + ratio 0.7 + rotation histogram."""
    dist = M.hamming_matrix(desc_a, desc_b)
    cand = valid_a[:, None] & valid_b[None, :]
    res = M.masked_best_match(dist, cand, M.TH_LOW, 0.7)
    ok = M.rotation_consistency(angle_a, angle_b, res.idx, res.valid)
    res = M.MatchResult(jnp.where(ok, res.idx, -1), jnp.where(ok, res.dist, BIG))
    return M.resolve_duplicate_targets(res, desc_b.shape[0])


@jax.jit
def match_by_bow(desc_a, valid_a, angle_a, node_a,
                 desc_b, valid_b, angle_b, node_b):
    """SearchByBoW with the reference's FeatureVector node gate
    (src/ORBmatcher.cpp:243-299): only descriptors under the SAME depth-2
    vocabulary node are compared — the gate is both a selectivity filter
    (coarse appearance agreement before Hamming argmin) and, in the
    reference, a ~10x candidate cut. node_a/node_b: [*] int32 gate node per
    feature (-1 = unassigned, never matches). TH_LOW + ratio 0.7 +
    rotation histogram, as the ungated form."""
    dist = M.hamming_matrix(desc_a, desc_b)
    same = (node_a[:, None] == node_b[None, :]) & (node_a >= 0)[:, None]
    cand = valid_a[:, None] & valid_b[None, :] & same
    res = M.masked_best_match(dist, cand, M.TH_LOW, 0.7)
    ok = M.rotation_consistency(angle_a, angle_b, res.idx, res.valid)
    res = M.MatchResult(jnp.where(ok, res.idx, -1), jnp.where(ok, res.dist, BIG))
    return M.resolve_duplicate_targets(res, desc_b.shape[0])


def epipolar_match_core(T1, T2, kp1_xy, kp1_oct, desc1, free1,
                        kp2_xy, kp2_oct, desc2, free2, sigma2_levels,
                        fx, fy, cx, cy):
    """Traced core of epipolar_match (called per neighbor inside the fused
    keyframe program's lax.scan, engine_keyframe.py)."""
    R1, t1 = T1[:, :3], T1[:, 3]
    R2, t2 = T2[:, :3], T2[:, 3]
    # relative pose cam1<-cam2: R12 = R1 R2^T, t12 = -R12 t2 + t1
    R12 = R1 @ R2.T
    t12 = t1 - R12 @ t2
    # Fundamental F12 such that x1^T F12 x2 = 0 (LocalMapping::ComputeF12,
    # src/LocalMapping.cpp:723-744)
    tx = jnp.array([[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]], [-t12[1], t12[0], 0]])
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    F12 = Kinv.T @ tx @ R12 @ Kinv

    p1 = jnp.concatenate([kp1_xy, jnp.ones_like(kp1_xy[:, :1])], -1)
    p2 = jnp.concatenate([kp2_xy, jnp.ones_like(kp2_xy[:, :1])], -1)
    # epipolar line in image 2 for each kp1: l2 = F12^T x1
    l2 = p1 @ F12  # [N1, 3]
    num = jnp.abs(l2 @ p2.T)  # [N1, N2] distance numerator
    den = jnp.sqrt(l2[:, 0] ** 2 + l2[:, 1] ** 2)[:, None]
    dsqr = (num / jnp.maximum(den, 1e-9)) ** 2
    # gate: 3.84 * sigma^2(octave of kp2) (src/ORBmatcher.cpp:158)
    sig2 = sigma2_levels[jnp.clip(kp2_oct, 0, sigma2_levels.shape[0] - 1)]
    epi_ok = dsqr < 3.84 * sig2[None, :]

    dist = M.hamming_matrix(desc1, desc2)
    cand = epi_ok & free1[:, None] & free2[None, :]
    res = M.masked_best_match(dist, cand, M.TH_LOW, 0.75)
    return M.resolve_duplicate_targets(res, kp2_xy.shape[0])


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def epipolar_match(T1, T2, kp1_xy, kp1_oct, desc1, free1,
                   kp2_xy, kp2_oct, desc2, free2, sigma2_levels,
                   fx: float, fy: float, cx: float, cy: float):
    """Match unmatched features across two keyframes with an epipolar-line
    gate (ORBmatcher::SearchForTriangulation + CheckDistEpipolarLine,
    src/ORBmatcher.cpp:785-994, :135-160). T1/T2: [3,4] Tcw."""
    return epipolar_match_core(T1, T2, kp1_xy, kp1_oct, desc1, free1,
                               kp2_xy, kp2_oct, desc2, free2, sigma2_levels,
                               fx, fy, cx, cy)
