"""Multi-session map merging: align and fuse two independent maps.

BASELINE.json configs item 5 ("multi-sequence merged map") — a capability
beyond the reference (ORB-SLAM2 is single-session; multi-map arrived only in
ORB-SLAM3). Reuses the loop-closing machinery: BoW candidates across maps,
descriptor matching, Horn Sim(3) RANSAC + GN refinement, then a similarity
re-basing of the second map into the first map's frame, array concatenation,
duplicate-point fusion and a joint pose-graph refinement.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import Sensor
from .frontend import matcher as FM
from .geometry import se3_np
from .map.mapstate import MapState
from .ops import features as F
from .ops import sim3_solver as S3


def find_cross_map_alignment(sys_a, map_b: MapState, bow_encode, sample=8):
    """Find a Sim3 aligning map_b's world frame into sys_a's.

    Returns (ok, W) with W = dict(s, R, t): p_worldA = s R p_worldB + t.
    """
    mp_a = sys_a.map
    cfg = sys_a.cfg
    cam = cfg.camera
    sigma2 = F.sigma2_per_octave(cfg.orb)
    fix_scale = cfg.sensor != Sensor.MONOCULAR
    key = jax.random.PRNGKey(77)

    kf_bs = map_b.kf_ids
    if len(kf_bs) == 0 or mp_a.n_keyframes == 0:
        return False, None
    step = max(len(kf_bs) // sample, 1)
    for kb in kf_bs[::step]:
        kb = int(kb)
        vec, _ = bow_encode(map_b.kf_desc[kb], map_b.kf_feat_valid[kb])
        cands = sys_a.kf_db.detect_reloc_candidates(vec)
        for ka in cands[:3]:
            ka = int(ka)
            has_a = mp_a.kf_pt[ka] >= 0
            has_b = map_b.kf_pt[kb] >= 0
            res = FM.match_descriptors_ratio(
                jnp.asarray(mp_a.kf_desc[ka]), jnp.asarray(has_a),
                jnp.asarray(mp_a.kf_angle[ka]),
                jnp.asarray(map_b.kf_desc[kb]), jnp.asarray(has_b),
                jnp.asarray(map_b.kf_angle[kb]))
            midx = np.asarray(res.idx)
            ia = np.flatnonzero(midx >= 0)
            if len(ia) < 20:
                continue
            ib = midx[ia]
            Ta = mp_a.kf_pose[ka]
            Tb = map_b.kf_pose[kb]
            P1 = mp_a.pt_xyz[mp_a.kf_pt[ka, ia]] @ Ta[:, :3].T + Ta[:, 3]
            P2 = map_b.pt_xyz[map_b.kf_pt[kb, ib]] @ Tb[:, :3].T + Tb[:, 3]
            cap = 512
            n = min(len(ia), cap)
            pad = cap - n
            P1p = np.concatenate([P1[:n], np.zeros((pad, 3))]).astype(np.float32)
            P2p = np.concatenate([P2[:n], np.zeros((pad, 3))]).astype(np.float32)
            s1 = np.concatenate([sigma2[np.clip(mp_a.kf_octave[ka, ia[:n]], 0, 7)],
                                 np.ones(pad)]).astype(np.float32)
            s2 = np.concatenate([sigma2[np.clip(map_b.kf_octave[kb, ib[:n]], 0, 7)],
                                 np.ones(pad)]).astype(np.float32)
            vmask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
            key, sub = jax.random.split(key)
            sr = S3.sim3_ransac(sub, jnp.asarray(P1p), jnp.asarray(P2p),
                                jnp.asarray(s1), jnp.asarray(s2),
                                jnp.asarray(vmask), cam.fx, cam.fy, cam.cx,
                                cam.cy, fix_scale=fix_scale)
            if int(sr.n_inliers) < 20:
                continue
            s12, R12, t12 = float(sr.s), np.asarray(sr.R), np.asarray(sr.t)
            # W_ab = T_a^-1 ∘ S12 ∘ T_b  (cam_b -> cam_a lifted to worlds)
            Ra, ta = Ta[:, :3], Ta[:, 3]
            Rb, tb = Tb[:, :3], Tb[:, 3]
            R_w = Ra.T @ R12 @ Rb
            s_w = s12
            t_w = Ra.T @ (s12 * (R12 @ tb) + t12 - ta)
            return True, {"s": s_w, "R": R_w.astype(np.float32),
                          "t": t_w.astype(np.float32), "ka": ka, "kb": kb}
    return False, None


def merge_maps(sys_a, map_b: MapState) -> bool:
    """Merge map_b into sys_a's map (in place). Returns success."""
    ok, W = find_cross_map_alignment(sys_a, map_b,
                                     sys_a.relocalizer.frame_bow)
    if not ok:
        return False
    mp_a = sys_a.map
    s_w, R_w, t_w = W["s"], W["R"], W["t"]

    # remap B's points into A's world
    b_pts = np.flatnonzero(map_b.pt_valid)
    new_xyz = (s_w * (map_b.pt_xyz[b_pts] @ R_w.T) + t_w).astype(np.float32)
    pt_map = {}  # B point id -> A point id
    ids = mp_a.add_points(new_xyz, map_b.pt_desc[b_pts], ref_kf=0, first_kf=0,
                          patch=map_b.pt_patch[b_pts])
    for bp, ap in zip(b_pts, ids):
        pt_map[int(bp)] = int(ap)

    # re-base B's keyframes: T'_j = (1, T_j) ∘ W^-1, SE3-demoted
    s_inv = 1.0 / s_w
    R_inv = R_w.T
    t_inv = -s_inv * (R_inv @ t_w)
    kf_map = {}
    for kb in map_b.kf_ids:
        kb = int(kb)
        Tb = map_b.kf_pose[kb]
        # Sim3 compose (1, Rb, tb) ∘ (s_inv, R_inv, t_inv):
        #   s' = s_inv; R' = Rb R_inv; t' = Rb t_inv + tb
        R_new = Tb[:, :3] @ R_inv
        t_prime = Tb[:, :3] @ t_inv + Tb[:, 3]
        T_new = np.hstack([R_new, (t_prime / s_inv)[:, None]]).astype(np.float32)
        pt_idx = np.array([pt_map.get(int(p), -1) for p in map_b.kf_pt[kb]],
                          np.int32)
        ka_new = mp_a.add_keyframe(
            T_new, map_b.kf_timestamp[kb], int(map_b.kf_frame_id[kb]),
            map_b.kf_xy[kb], map_b.kf_octave[kb], map_b.kf_angle[kb],
            map_b.kf_desc[kb], map_b.kf_feat_valid[kb], pt_idx,
            depth=map_b.kf_depth[kb], ur=map_b.kf_ur[kb],
            patch=map_b.kf_patch[kb], xy0=map_b.kf_xy0[kb],
            ur0=map_b.kf_ur0[kb])
        kf_map[kb] = ka_new
        sys_a.local_mapper.register_keyframe(ka_new)
        mp_a.kf_parent[ka_new] = kf_map.get(int(map_b.kf_parent[kb]), W["ka"])

    mp_a.pt_ref_kf[ids] = kf_map.get(int(W["kb"]), W["ka"])
    mp_a.refresh_point_stats(ids)

    # fuse duplicate points around the junction, then joint refinement
    sys_a.local_mapper.fuse_neighbors(kf_map[W["kb"]])
    sys_a.local_mapper.local_ba(kf_map[W["kb"]])
    return True
