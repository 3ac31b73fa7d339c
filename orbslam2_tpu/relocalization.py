"""Relocalization: recover the camera after tracking loss.

TPU-native redesign of Tracking::Relocalization (src/Tracking.cpp:1800-2028):
BoW candidates from the keyframe database -> per-candidate descriptor
matching -> batched PnP RANSAC -> LM pose refinement -> projective rescue.
The reference alternates per-candidate CPU loops; here each candidate costs
two device dispatches and candidates are capped at 5 (as the reference's
database returns).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import SlamConfig
from .frontend import matcher as FM
from .frontend.frame import Frame
from .map.keyframe_db import KeyFrameDatabase
from .map.mapstate import MapState
from .ops import bow as BOW
from .ops import features as F
from .ops import pnp as PNP
from .ops import pose_opt as PO
from .io.vocabulary import Vocabulary


class Relocalizer:
    def __init__(self, cfg: SlamConfig, mp: MapState, voc: Vocabulary,
                 db: KeyFrameDatabase):
        self.cfg = cfg
        self.map = mp
        self.voc = voc
        self.db = db
        self.sigma2 = F.sigma2_per_octave(cfg.orb)
        self._key = jax.random.PRNGKey(17)

    def frame_bow(self, desc: np.ndarray, valid: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
        """Sparse tf-idf BoW of a frame: (word_ids, L1-normalized weights).
        The device kernel assigns words; the sparse vector is built on host
        so memory stays O(words-per-frame) regardless of vocabulary size."""
        words, wvalid = BOW.assign_words(
            jnp.asarray(self.voc.node_desc), jnp.asarray(self.voc.node_children),
            jnp.asarray(self.voc.node_word), jnp.asarray(desc),
            jnp.asarray(valid), self.voc.levels)
        w = np.asarray(words)[np.asarray(wvalid)]
        uniq, counts = np.unique(w, return_counts=True)
        wt = self.voc.word_weight[uniq] * counts
        s = wt.sum()
        if s > 0:
            wt = wt / s
        return uniq.astype(np.int32), wt.astype(np.float32)

    def relocalize(self, frame: Frame) -> bool:
        vec = self.frame_bow(frame.desc, frame.valid)
        candidates = self.db.detect_reloc_candidates(vec)
        if len(candidates) == 0:
            return False
        mp = self.map
        cam = self.cfg.camera
        for k in candidates[:5]:
            k = int(k)
            has_pt = mp.kf_pt[k] >= 0
            res = FM.match_descriptors_ratio(
                jnp.asarray(mp.kf_desc[k]), jnp.asarray(has_pt),
                jnp.asarray(mp.kf_angle[k]),
                jnp.asarray(frame.desc), jnp.asarray(frame.valid),
                jnp.asarray(frame.angle))
            midx = np.asarray(res.idx)
            src = np.flatnonzero(midx >= 0)
            if len(src) < 15:  # src/Tracking.cpp:1862
                continue
            # PnP on the matched subset, padded to frame capacity
            N = frame.capacity
            X = np.zeros((N, 3), np.float32)
            uv = np.zeros((N, 2), np.float32)
            sg = np.ones(N, np.float32)
            val = np.zeros(N, bool)
            pts = mp.kf_pt[k, src]
            ok = mp.pt_valid[np.clip(pts, 0, None)] & (pts >= 0)
            tgt = midx[src[ok]]
            X[:len(tgt)] = mp.pt_xyz[pts[ok]]
            uv[:len(tgt)] = frame.xy[tgt]
            sg[:len(tgt)] = self.sigma2[
                np.clip(frame.octave[tgt], 0, len(self.sigma2) - 1)]
            val[:len(tgt)] = True
            if val.sum() < 10:
                continue
            self._key, sub = jax.random.split(self._key)
            pr = PNP.pnp_ransac(sub, jnp.asarray(X), jnp.asarray(uv),
                                jnp.asarray(sg), jnp.asarray(val),
                                cam.fx, cam.fy, cam.cx, cam.cy)
            if int(pr.n_inliers) < 10:
                continue
            # refine with the pose optimizer on the matched set
            frame.pose = np.asarray(pr.T)
            frame.pt_idx = np.full(frame.capacity, -1, np.int32)
            frame.pt_idx[tgt] = pts[ok]
            obs = np.concatenate([frame.xy, frame.ur[:, None]], -1).astype(np.float32)
            pvalid = (frame.pt_idx >= 0)
            info = (1.0 / self.sigma2)[np.clip(frame.octave, 0, len(self.sigma2) - 1)]
            opt = PO.pose_optimize(
                jnp.asarray(frame.pose),
                jnp.asarray(mp.pt_xyz[np.clip(frame.pt_idx, 0, None)]),
                jnp.asarray(obs), jnp.asarray((frame.ur >= 0) & pvalid),
                jnp.asarray(info.astype(np.float32)), jnp.asarray(pvalid),
                cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
            n_inl = int(opt.n_inliers)
            if n_inl < 25:
                continue
            frame.pose = np.asarray(opt.T)
            inl = np.asarray(opt.inliers)
            frame.pt_idx = np.where(pvalid & ~inl, -1, frame.pt_idx)
            # projective rescue to reach the 50-inlier gate
            # (src/Tracking.cpp:1908-1950) is handled by the caller's
            # track_local_map pass, which requires 50 after relocalization
            return True
        return False
