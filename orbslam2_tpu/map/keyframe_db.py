"""Place-recognition database over dense BoW vectors.

TPU-native replacement for KeyFrameDatabase (src/KeyFrameDatabase.cpp).
The reference's inverted file `mvInvertedFile[wordId] -> list<KeyFrame*>`
exists to make sparse scoring cheap on a CPU; with dense [K, V] keyframe
vectors the scoring sweep is one matvec, and shared-word counts are a
binary matvec — so the same candidate logic runs on the full keyframe set:

- DetectLoopCandidates (:99): exclude covisible KFs, keep > 0.8 * max
  common words, L1 score >= min_score, covisibility-group score
  accumulation, return > 0.75 * best accumulated score
- DetectRelocalizationCandidates (:244): same without the covisibility
  exclusion / min score
"""
from __future__ import annotations

import numpy as np

from ..config import SlamConfig
from .mapstate import MapState


class KeyFrameDatabase:
    def __init__(self, cfg: SlamConfig, mp: MapState, n_words: int):
        self.cfg = cfg
        self.map = mp
        self.n_words = n_words
        K = cfg.max_keyframes
        self.vectors = np.zeros((K, n_words), np.float32)
        self.present = np.zeros((K, n_words), bool)
        self.registered = np.zeros(K, bool)

    def add(self, kf: int, vec: np.ndarray):
        self.vectors[kf] = vec
        self.present[kf] = vec > 0
        self.registered[kf] = True

    def erase(self, kf: int):
        self.registered[kf] = False
        self.vectors[kf] = 0
        self.present[kf] = False

    def _active(self):
        return self.registered & self.map.kf_valid

    def _common_words(self, vec_present: np.ndarray) -> np.ndarray:
        return (self.present & vec_present[None, :]).sum(axis=1)

    def _scores(self, vec: np.ndarray) -> np.ndarray:
        return 1.0 - 0.5 * np.abs(self.vectors - vec[None, :]).sum(axis=1)

    def detect_loop_candidates(self, kf: int, min_score: float) -> np.ndarray:
        """src/KeyFrameDatabase.cpp:99-242."""
        mp = self.map
        connected = set(int(x) for x in mp.covisible_kfs(kf, min_weight=15))
        active = self._active().copy()
        active[kf] = False
        for c in connected:
            active[c] = False
        if not active.any():
            return np.array([], np.int64)
        common = self._common_words(self.present[kf])
        common[~active] = 0
        max_common = common.max()
        if max_common == 0:
            return np.array([], np.int64)
        min_common = max(int(0.8 * max_common), 1)
        scores = self._scores(self.vectors[kf])
        cand = np.flatnonzero(active & (common >= min_common) & (scores >= min_score))
        if len(cand) == 0:
            return cand
        # accumulate score over each candidate's top-10 covisible group
        acc, best_of_group = [], []
        for c in cand:
            group = [int(c)] + [int(x) for x in mp.covisible_kfs(int(c), 10)]
            g_scores = [scores[g] for g in group
                        if active[g] and common[g] >= min_common] + [scores[c]]
            acc.append(float(np.sum(g_scores)))
            best_of_group.append(int(group[int(np.argmax([scores[g] for g in group]))]))
        acc = np.array(acc)
        keep = acc > 0.75 * acc.max()
        out = sorted(set(np.array(best_of_group)[keep].tolist()))
        return np.array(out, np.int64)

    def detect_reloc_candidates(self, vec: np.ndarray) -> np.ndarray:
        """src/KeyFrameDatabase.cpp:244-369."""
        active = self._active()
        if not active.any():
            return np.array([], np.int64)
        common = self._common_words(vec > 0)
        common[~active] = 0
        max_common = common.max()
        if max_common == 0:
            return np.array([], np.int64)
        min_common = max(int(0.8 * max_common), 1)
        scores = self._scores(vec)
        cand = np.flatnonzero(active & (common >= min_common))
        if len(cand) == 0:
            return cand
        acc = []
        for c in cand:
            group = [int(c)] + [int(x) for x in self.map.covisible_kfs(int(c), 10)]
            acc.append(float(np.sum([scores[g] for g in group if active[g]])))
        acc = np.array(acc)
        keep = acc > 0.75 * acc.max()
        order = cand[keep][np.argsort(-scores[cand[keep]])]
        return order[:5]
