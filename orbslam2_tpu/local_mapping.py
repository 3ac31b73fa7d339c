"""Local mapping: per-keyframe map growth and refinement.

TPU-native redesign of src/LocalMapping.cpp. The reference's mapping thread
becomes a pipeline stage invoked per keyframe (synchronously or from an
async executor — system.py); each step is a batched device program plus
host bookkeeping on the SoA map:

- MapPointCulling (:241)       -> `cull_recent_points` (vectorized rules)
- CreateNewMapPoints (:298)    -> epipolar-gated matching kernel + batched
  DLT triangulation with the reference's chi2/parallax/scale gates
- SearchInNeighbors (:611)     -> `fuse_neighbors` (projection fuse kernel)
- Optimizer::LocalBundleAdjustment (src/Optimizer.cpp:564) -> `local_ba`
  on bucketed fixed shapes via ops/ba.ba_solve
- KeyFrameCulling (:832)       -> `cull_keyframes` (>=90% redundancy rule)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import SlamConfig, Sensor
from .frontend import matcher as FM
from .geometry import se3
from .map.mapstate import MapState
from .ops import ba as BA
from .ops import features as F
from .ops import matching as M
from .ops import refine as RF
from .ops import triangulation as TRI


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def build_ba_problem(mp: MapState, cfg: SlamConfig, sigma2: np.ndarray,
                     cams: list[int], fixed: list[int],
                     points: np.ndarray | None = None):
    """Construct a bucketed fixed-shape BAProblem from map slices.

    Returns (prob, meta) where meta carries the index bookkeeping needed to
    write results back: cam_arr, points, kf_of_e, fi (feature index per
    edge), E_need, and n_dropped (edges beyond the bucket, subsampled out).
    """
    cam_arr = np.asarray(cams, np.int32)
    if points is None:
        points = np.unique(mp.kf_pt[cam_arr])
        points = points[points >= 0]
        points = points[mp.pt_valid[points]]
    pt_buckets = cfg.ba_point_buckets
    P = _bucket(len(points), pt_buckets)
    points = points[:P]

    # edge list: observations of selected points by selected cams
    pt_slot = np.full(mp.pt_xyz.shape[0], -1, np.int32)
    pt_slot[points] = np.arange(len(points))
    cam_slot = np.full(mp.kf_pose.shape[0], -1, np.int32)
    cam_slot[cam_arr] = np.arange(len(cam_arr))
    sub_pt = mp.kf_pt[cam_arr]                       # [C, N]
    e_mask = (sub_pt >= 0) & (pt_slot[np.clip(sub_pt, 0, None)] >= 0)
    ci, fi = np.where(e_mask)
    E_need = len(ci)
    E = _bucket(E_need, cfg.ba_edge_buckets)
    n_dropped = max(E_need - E, 0)
    if E_need > E:
        keep = np.random.default_rng(0).choice(E_need, E, replace=False)
        ci, fi = ci[keep], fi[keep]
        E_need = E
    kf_of_e = cam_arr[ci]
    pt_of_e = sub_pt[ci, fi]
    uv = mp.kf_xy[kf_of_e, fi]
    ur = mp.kf_ur[kf_of_e, fi]
    octv = mp.kf_octave[kf_of_e, fi]
    info = (1.0 / sigma2)[np.clip(octv, 0, len(sigma2) - 1)]

    C = _bucket(len(cam_arr), cfg.ba_cam_buckets)
    padC = C - len(cam_arr)
    padP = P - len(points)
    padE = E - E_need

    fixed_set = set(fixed)
    prob = BA.BAProblem(
        cam_T=jnp.asarray(np.concatenate(
            [mp.kf_pose[cam_arr],
             np.tile(np.eye(3, 4, dtype=np.float32), (padC, 1, 1))])),
        cam_fixed=jnp.asarray(np.concatenate(
            [np.array([c in fixed_set for c in cams]),
             np.ones(padC, bool)])),
        cam_valid=jnp.asarray(np.concatenate(
            [np.ones(len(cam_arr), bool), np.zeros(padC, bool)])),
        pts=jnp.asarray(np.concatenate(
            [mp.pt_xyz[points], np.zeros((padP, 3), np.float32)])),
        pt_valid=jnp.asarray(np.concatenate(
            [np.ones(len(points), bool), np.zeros(padP, bool)])),
        e_cam=jnp.asarray(np.concatenate(
            [cam_slot[kf_of_e], np.zeros(padE, np.int32)]).astype(np.int32)),
        e_pt=jnp.asarray(np.concatenate(
            [pt_slot[pt_of_e], np.zeros(padE, np.int32)]).astype(np.int32)),
        e_obs=jnp.asarray(np.concatenate(
            [np.stack([uv[:, 0], uv[:, 1], np.maximum(ur, 0.0)], -1),
             np.zeros((padE, 3), np.float32)]).astype(np.float32)),
        e_stereo=jnp.asarray(np.concatenate([ur >= 0, np.zeros(padE, bool)])),
        e_info=jnp.asarray(np.concatenate(
            [info, np.zeros(padE)]).astype(np.float32)),
        e_valid=jnp.asarray(np.concatenate(
            [np.ones(E_need, bool), np.zeros(padE, bool)])),
    )
    meta = {"cam_arr": cam_arr, "points": points, "kf_of_e": kf_of_e,
            "fi": fi, "E_need": E_need, "fixed_set": fixed_set,
            "n_dropped": n_dropped}
    return prob, meta


class LocalMapper:
    def __init__(self, cfg: SlamConfig, mp: MapState, loop_closer=None,
                 kf_db=None, bow_encode=None):
        self.cfg = cfg
        self.map = mp
        self.loop_closer = loop_closer
        self.kf_db = kf_db
        self.bow_encode = bow_encode
        self.sf = F.scale_factors(cfg.orb)
        self.sigma2 = F.sigma2_per_octave(cfg.orb)
        # recent points: pt_id -> (birth counter, birth keyframe). The birth
        # keyframe lets us detect a recycled slot (pt_first_kf changed) so a
        # stale entry can't kill a fresh point that reused the slot.
        self.recent: dict[int, tuple[int, int]] = {}
        self.kf_counter = 0

    def register_keyframe(self, kf: int):
        """BoW transform + place-recognition index insert
        (ProcessNewKeyFrame's ComputeBoW + KeyFrameDatabase::add)."""
        if self.kf_db is not None and self.bow_encode is not None:
            vec = self.bow_encode(self.map.kf_desc[kf],
                                  self.map.kf_feat_valid[kf])
            self.kf_db.add(kf, vec)

    # ------------------------------------------------------------- refinement
    def _refine_obs_absolute(self, tkf: int, feats: np.ndarray,
                             templates: np.ndarray):
        """Template-align keyframe observations (ops/refine.py): for each
        (tkf, feats[i]) write kf_xy = kf_xy0 + LK offset vs templates[i].
        ABSOLUTE w.r.t. the stored window center, so re-refinement against a
        different template never compounds. Fixed 512-pair buckets."""
        mp = self.map
        if len(feats) == 0:
            return
        Mb = 512
        sf = self.sf
        for s in range(0, len(feats), Mb):
            f = feats[s:s + Mb]
            t = templates[s:s + Mb]
            n = len(f)
            pad = Mb - n
            fp = np.concatenate([f, np.zeros(pad, f.dtype)])
            win = mp.kf_patch[tkf, fp].astype(np.float32)
            tpl = np.concatenate(
                [t.astype(np.float32), np.zeros((pad,) + t.shape[1:], np.float32)])
            vmask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
            delta, ok = RF.refine_offsets(
                jnp.asarray(win), jnp.asarray(tpl), jnp.asarray(vmask))
            ok = np.asarray(ok) & vmask
            if not ok.any():
                continue
            fo = fp[ok]
            lv = np.clip(mp.kf_octave[tkf, fo], 0, len(sf) - 1)
            d = np.asarray(delta)[ok] * sf[lv][:, None]
            mp.kf_xy[tkf, fo] = mp.kf_xy0[tkf, fo] + d
            ur0 = mp.kf_ur0[tkf, fo]
            mp.kf_ur[tkf, fo] = np.where(ur0 >= 0, ur0 + d[:, 0], ur0)

    def refine_bound_observations(self, kf: int):
        """Re-measure every point-bound feature of a new keyframe against its
        point's anchor template, so BA edges are template-consistent even
        when the frame-level refinement used a different (temporal VO)
        template."""
        mp = self.map
        feats = np.flatnonzero(mp.kf_pt[kf] >= 0)
        if len(feats) == 0:
            return
        self._refine_obs_absolute(kf, feats, mp.pt_patch[mp.kf_pt[kf, feats]])

    # ---------------------------------------------------------------- process
    def process(self, kf: int):
        """ProcessNewKeyFrame + the per-KF pipeline (LocalMapping::Run,
        src/LocalMapping.cpp:48-170)."""
        self.kf_counter += 1
        self.register_keyframe(kf)
        self.refine_bound_observations(kf)
        # spanning-tree parent: most covisible KF at insertion
        if self.map.kf_parent[kf] < 0:
            w = self.map.covisibility_weights(kf)
            if w.max() > 0:
                self.map.kf_parent[kf] = int(np.argmax(w))
        self.map.refresh_point_stats(np.unique(self.map.kf_pt[kf][self.map.kf_pt[kf] >= 0]))
        self.cull_recent_points()
        self.create_new_points(kf)
        self.fuse_neighbors(kf)
        self.local_ba(kf)
        self.cull_keyframes(kf)
        if self.loop_closer is not None:
            self.loop_closer.process(kf)

    # ---------------------------------------------------------------- culling
    def cull_recent_points(self):
        """MapPointCulling (src/LocalMapping.cpp:241-296): kill points with
        found-ratio < 0.25, or too few observers after 2 keyframes; graduate
        after 3."""
        if not self.recent:
            return
        mp = self.map
        ids = np.fromiter(self.recent.keys(), np.int64)
        birth = np.array([v[0] for v in self.recent.values()], np.int64)
        birth_kf = np.array([v[1] for v in self.recent.values()], np.int64)
        stale = mp.pt_first_kf[ids] != birth_kf  # slot recycled: drop entry
        age = self.kf_counter - birth
        obs = mp.point_obs_count()[ids]
        found_ratio = mp.pt_found[ids] / np.maximum(mp.pt_visible[ids], 1.0)
        min_obs = 2 if self.cfg.sensor == Sensor.MONOCULAR else 3
        kill = ((found_ratio < 0.25) | ((age >= 2) & (obs <= min_obs))
                | ~mp.pt_valid[ids]) & ~stale
        graduate = (age >= 3) & ~kill
        mp.remove_points(ids[kill & mp.pt_valid[ids]])
        for p in ids[kill | graduate | stale]:
            self.recent.pop(int(p), None)

    def cull_keyframes(self, kf: int):
        """KeyFrameCulling (src/LocalMapping.cpp:832-921): discard a local
        covisible KF if >=90% of its (close, for stereo/RGB-D) points are
        seen by >=3 OTHER keyframes at the same or finer scale
        (scaleLeveli <= scaleLevel + 1, :873-908)."""
        mp = self.map
        for k in mp.covisible_kfs(kf):
            k = int(k)
            if k == kf or mp.kf_frame_id[k] <= 1:
                continue
            feats = np.flatnonzero(mp.kf_pt[k] >= 0)
            pts = mp.kf_pt[k, feats]
            if self.cfg.sensor != Sensor.MONOCULAR:
                # only close, positive-depth points count (:861-866)
                d = mp.kf_depth[k, feats]
                keep = (d > 0) & (d < self.cfg.close_depth_threshold)
                feats, pts = feats[keep], pts[keep]
            n_pts = len(pts)
            if n_pts == 0:
                continue
            # every observation of this KF's points, with observer octave
            rows, cols, obs_pt = mp.observations_of(pts)
            lv_of_pt = np.full(mp.pt_xyz.shape[0], 0, np.int32)
            lv_of_pt[pts] = mp.kf_octave[k, feats]
            same_or_finer = (rows != k) & (
                mp.kf_octave[rows, cols] <= lv_of_pt[obs_pt] + 1)
            n_good_obs = np.bincount(obs_pt[same_or_finer],
                                     minlength=mp.pt_xyz.shape[0])
            redundant = n_good_obs[pts] >= 3
            if redundant.sum() > 0.9 * n_pts:
                mp.remove_keyframe(k)
                if self.kf_db is not None:
                    self.kf_db.erase(k)

    # ----------------------------------------------------------- new points
    def create_new_points(self, kf: int):
        """CreateNewMapPoints (src/LocalMapping.cpp:298-610)."""
        mp = self.map
        cfg = self.cfg
        n_neigh = 20 if cfg.sensor == Sensor.MONOCULAR else 10
        neighbors = mp.covisible_kfs(kf, n_neigh)
        if len(neighbors) == 0:
            return
        cam = cfg.camera
        T1 = mp.kf_pose[kf]
        Ow1 = -T1[:, :3].T @ T1[:, 3]
        free1 = (mp.kf_pt[kf] < 0) & mp.kf_feat_valid[kf]

        for kn in neighbors:
            kn = int(kn)
            T2 = mp.kf_pose[kn]
            Ow2 = -T2[:, :3].T @ T2[:, 3]
            baseline = float(np.linalg.norm(Ow1 - Ow2))
            # baseline/median-depth check (src/LocalMapping.cpp:349-365)
            if cfg.sensor == Sensor.MONOCULAR:
                pts2 = mp.kf_pt[kn]
                vis = pts2 >= 0
                if vis.sum() < 20:
                    continue
                pc = mp.pt_xyz[pts2[vis]] @ T2[:, :3].T + T2[:, 3]
                med_depth = float(np.median(pc[:, 2]))
                if med_depth <= 0 or baseline / med_depth < 0.01:
                    continue
            elif baseline < cam.baseline:
                continue

            free2 = (mp.kf_pt[kn] < 0) & mp.kf_feat_valid[kn]
            res = FM.epipolar_match(
                jnp.asarray(T1), jnp.asarray(T2),
                jnp.asarray(mp.kf_xy[kf]), jnp.asarray(mp.kf_octave[kf]),
                jnp.asarray(mp.kf_desc[kf]), jnp.asarray(free1),
                jnp.asarray(mp.kf_xy[kn]), jnp.asarray(mp.kf_octave[kn]),
                jnp.asarray(mp.kf_desc[kn]), jnp.asarray(free2),
                jnp.asarray(self.sigma2), cam.fx, cam.fy, cam.cx, cam.cy)
            midx = np.asarray(res.idx)
            i1 = np.flatnonzero(midx >= 0)
            if len(i1) == 0:
                continue
            i2 = midx[i1]
            # template-align the pair before triangulating: the anchor
            # observation IS the template center (reset to the pristine
            # detection), the neighbor observation is LK-refined against it
            anchor_tpl = np.asarray(
                RF.template_of(mp.kf_patch[kf, i1].astype(np.float32)))
            mp.kf_xy[kf, i1] = mp.kf_xy0[kf, i1]
            mp.kf_ur[kf, i1] = mp.kf_ur0[kf, i1]
            self._refine_obs_absolute(kn, i2, anchor_tpl)
            ok, X = self._triangulate_pairs(kf, kn, i1, i2)
            i1, i2 = i1[:len(ok)], i2[:len(ok)]
            anchor_tpl = anchor_tpl[:len(ok)]
            if ok.sum() == 0:
                continue
            i1o, i2o, Xo = i1[ok], i2[ok], X[ok]
            try:
                pt_ids = mp.add_points(Xo.astype(np.float32),
                                       mp.kf_desc[kf, i1o], ref_kf=kf,
                                       first_kf=kf,
                                       patch=anchor_tpl[ok])
            except RuntimeError:
                return  # point capacity exhausted
            mp.kf_pt[kf, i1o] = pt_ids
            mp.kf_pt[kn, i2o] = pt_ids
            free1[i1o] = False
            for p in pt_ids:
                self.recent[int(p)] = (self.kf_counter, kf)
            mp.refresh_point_stats(pt_ids)

    def _triangulate_pairs(self, k1: int, k2: int, i1, i2):
        """Triangulate matched pairs with the reference gates via the padded
        jitted kernel (ops/triangulation.py)."""
        mp = self.map
        cam = self.cfg.camera
        M = 512  # static pair bucket
        n = min(len(i1), M)
        pad = M - n
        i1p = np.concatenate([i1[:n], np.zeros(pad, i1.dtype)])
        i2p = np.concatenate([i2[:n], np.zeros(pad, i2.dtype)])
        vmask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        X, ok = TRI.triangulate_gated(
            jnp.asarray(mp.kf_pose[k1]), jnp.asarray(mp.kf_pose[k2]),
            jnp.asarray(mp.kf_xy[k1, i1p]), jnp.asarray(mp.kf_xy[k2, i2p]),
            jnp.asarray(mp.kf_octave[k1, i1p]), jnp.asarray(mp.kf_octave[k2, i2p]),
            jnp.asarray(vmask), jnp.asarray(self.sigma2), jnp.asarray(self.sf),
            cam.fx, cam.fy, cam.cx, cam.cy, self.cfg.orb.scale_factor)
        return np.asarray(ok)[:len(i1[:n])], np.asarray(X)[:len(i1[:n])]

    # -------------------------------------------------------------------- fuse
    def fuse_neighbors(self, kf: int):
        """SearchInNeighbors (src/LocalMapping.cpp:611-721): project the new
        keyframe's points into neighbors and neighbors' points into the new
        keyframe; merge duplicates keeping the most-observed point."""
        mp = self.map
        targets = [int(k) for k in mp.covisible_kfs(kf, 10)]
        if not targets:
            return
        obs_counts = mp.point_obs_count()
        pairs = [(kf, t) for t in targets] + [(t, kf) for t in targets]
        for src_kf, dst_kf in pairs:
            pts = mp.kf_pt[src_kf]
            pids = np.unique(pts[pts >= 0])
            pids = pids[mp.pt_valid[pids]]
            if len(pids) == 0:
                continue
            self._fuse_into(pids, dst_kf, obs_counts)

    def _fuse_into(self, pids, dst_kf: int, obs_counts):
        mp = self.map
        cam = self.cfg.camera
        cap = self.cfg.local_points_cap
        pids = pids[:cap]
        pad = cap - len(pids)
        lp = np.concatenate([pids, np.zeros(pad, pids.dtype)])
        pvalid = np.concatenate([np.ones(len(pids), bool), np.zeros(pad, bool)])
        res, _ = FM.match_local_points(
            jnp.asarray(mp.kf_pose[dst_kf]), jnp.asarray(mp.pt_xyz[lp]),
            jnp.asarray(pvalid), jnp.asarray(mp.pt_desc[lp]),
            jnp.asarray(mp.pt_normal[lp]), jnp.asarray(mp.pt_min_dist[lp]),
            jnp.asarray(mp.pt_max_dist[lp]), jnp.asarray(np.zeros(cap, bool)),
            jnp.asarray(mp.kf_xy[dst_kf]), jnp.asarray(mp.kf_octave[dst_kf]),
            jnp.asarray(mp.kf_desc[dst_kf]), jnp.asarray(mp.kf_feat_valid[dst_kf]),
            jnp.asarray(mp.kf_ur[dst_kf]),
            jnp.asarray(self.sf), cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
            cam.width, cam.height, self.cfg.orb.n_levels,
            float(np.log(self.cfg.orb.scale_factor)), 3.0)
        midx = np.asarray(res.idx)
        touched = []
        new_feats, new_pts = [], []
        for s in np.flatnonzero(midx >= 0):
            p = int(lp[s])
            feat = int(midx[s])
            existing = int(mp.kf_pt[dst_kf, feat])
            if existing == p:
                continue
            if existing >= 0 and mp.pt_valid[existing]:
                # merge: keep the point with more observations
                # (ORBmatcher::Fuse, src/ORBmatcher.cpp:1091-1113)
                if obs_counts[existing] >= obs_counts[p]:
                    mp.replace_point(p, existing)
                    touched.append(existing)
                else:
                    mp.replace_point(existing, p)
                    mp.kf_pt[dst_kf, feat] = p
                    touched.append(p)
            else:
                mp.kf_pt[dst_kf, feat] = p
                touched.append(p)
                new_feats.append(feat)
                new_pts.append(p)
        if new_feats:
            # template-align the fresh observations (merge-branch features
            # keep their earlier refinement; their templates were duplicates
            # of the same physical corner)
            self._refine_obs_absolute(dst_kf, np.asarray(new_feats),
                                      mp.pt_patch[np.asarray(new_pts)])
        if touched:
            mp.refresh_point_stats(np.unique(touched))

    # ---------------------------------------------------------------- local BA
    def local_ba(self, kf: int, abort_check=None):
        """LocalBundleAdjustment window construction
        (src/Optimizer.cpp:564-941): local cams = current + covisible; local
        points = their points; fixed cams = other observers of those points."""
        mp = self.map
        local = [kf] + [int(k) for k in mp.covisible_kfs(kf)]
        local = local[:self.cfg.local_ba_cam_cap]
        lpts = np.unique(mp.kf_pt[local])
        lpts = lpts[(lpts >= 0)]
        lpts = lpts[mp.pt_valid[lpts]]
        if len(lpts) < 10:
            return
        # fixed second ring: KFs observing local points but not in local set
        seen = np.zeros(mp.pt_xyz.shape[0], bool)
        seen[lpts] = True
        observers = np.flatnonzero(
            ((seen[np.clip(mp.kf_pt, 0, None)] & (mp.kf_pt >= 0)).any(axis=1))
            & mp.kf_valid)
        fixed = [int(k) for k in observers if int(k) not in local][:24]
        # gauge fixing: the fixed second ring when present, plus the oldest
        # camera in the window (the reference fixes KF0 only,
        # src/Optimizer.cpp:640-652). The scale direction is then damped-only
        # for mono, as in the reference; the historical runaway attributed to
        # this was actually texture aliasing (io/synth.py notes).
        cams = local + fixed
        fixed_mask = np.zeros(len(cams), bool)
        fixed_mask[len(local):] = True
        if not fixed_mask.any():
            fixed_mask[int(np.argmin(mp.kf_frame_id[local]))] = True
        if mp.kf_frame_id[cams].min() <= mp.kf_frame_id[mp.kf_valid].min():
            fixed_mask[int(np.argmin(mp.kf_frame_id[cams]))] = True

        self.run_ba(cams, fixed=[cams[i] for i in np.flatnonzero(fixed_mask)],
                    points=lpts)

    def run_ba(self, cams: list[int], fixed: list[int],
               points: np.ndarray | None = None, iters=(5, 10)):
        """Build a bucketed BAProblem from map slices, solve, write back,
        and prune outlier observations."""
        mp = self.map
        prob, meta = build_ba_problem(mp, self.cfg, self.sigma2, cams, fixed,
                                      points)
        if meta["n_dropped"]:
            from .utils.metrics import log_event
            log_event("ba_edges_dropped", dropped=meta["n_dropped"],
                      kept=meta["E_need"])
        cam_p = self.cfg.camera
        res = BA.ba_solve(prob, cam_p.fx, cam_p.fy, cam_p.cx, cam_p.cy,
                          cam_p.bf, iters1=iters[0], iters2=iters[1])
        # write back
        cam_arr, points = meta["cam_arr"], meta["points"]
        fixed_set = meta["fixed_set"]
        kf_of_e, fi, E_need = meta["kf_of_e"], meta["fi"], meta["E_need"]
        new_T = np.asarray(res.cam_T)[:len(cam_arr)]
        for i, c in enumerate(cams):
            if c not in fixed_set:
                mp.kf_pose[c] = new_T[i]
        mp.pt_xyz[points] = np.asarray(res.pts)[:len(points)]
        mp.mark_points_dirty(points)  # direct geometry write (mirror sync)
        # prune outlier observations (src/Optimizer.cpp:845-941)
        inl = np.asarray(res.e_inlier)[:E_need]
        bad = ~inl
        if bad.any():
            mp.kf_pt[kf_of_e[bad], fi[bad]] = -1
        mp.refresh_point_stats(points)
