"""Keyframe database for loop/relocalization candidate retrieval.

TPU-native replacement for KeyFrameDatabase
(reference: src/KeyFrameDatabase.cc). The reference's inverted index
word->list<KF> becomes a dense (KF_cap, W) bag-of-words matrix: shared-word
counting and L1 scoring are both single matmuls/reductions over it — the
selection cascade (0.8*maxCommonWords, minScore, covisibility-group
accumulation, 0.75*bestAccScore) is unchanged.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .vocabulary import BinaryVocabulary


class KeyFrameDatabase:
    def __init__(self, voc: BinaryVocabulary, max_keyframes: int):
        self.voc = voc
        self.bow = np.zeros((max_keyframes, voc.n_words), np.float32)
        self.has_word = np.zeros((max_keyframes, voc.n_words), bool)
        self.active = np.zeros(max_keyframes, bool)

    def add(self, kf: int, bow: np.ndarray) -> None:
        self.bow[kf] = bow
        self.has_word[kf] = bow > 0
        self.active[kf] = True

    def erase(self, kf: int) -> None:
        self.active[kf] = False

    def clear(self) -> None:
        self.active[:] = False

    # ------------------------------------------------------------------

    def _common_words_and_scores(self, bow_q: np.ndarray):
        q_has = bow_q > 0
        common = (self.has_word & q_has[None, :]).sum(axis=1)
        scores = np.minimum(self.bow, bow_q[None, :]).sum(axis=1)
        return common, scores

    def detect_loop_candidates(self, kf: int, bow_q: np.ndarray, min_score: float,
                               covisible: np.ndarray, map_store) -> List[int]:
        """reference: KeyFrameDatabase::DetectLoopCandidates
        (KeyFrameDatabase.cc:114-263)."""
        common, scores = self._common_words_and_scores(bow_q)
        mask = self.active.copy()
        mask[kf] = False
        mask[covisible] = False  # exclude the covisible neighborhood
        common = np.where(mask, common, 0)
        if common.max(initial=0) == 0:
            return []
        min_common = int(0.8 * common.max())
        cand = np.nonzero(mask & (common > min_common) & (scores >= min_score))[0]
        if cand.size == 0:
            return []
        # accumulate scores over top-10 covisibility groups (reference :186-229)
        acc_scores = []
        for c in cand:
            group = [int(c)] + [int(x) for x in map_store.get_covisible(int(c), 10)]
            g = [x for x in group if mask[x] and common[x] > min_common]
            acc = float(scores[g].sum()) if g else float(scores[c])
            best_in_group = int(max(g, key=lambda x: scores[x])) if g else int(c)
            acc_scores.append((acc, best_in_group))
        best_acc = max(a for a, _ in acc_scores)
        out = []
        seen = set()
        for acc, best_kf in acc_scores:
            if acc > 0.75 * best_acc and best_kf not in seen:
                seen.add(best_kf)
                out.append(best_kf)
        return out

    def detect_relocalization_candidates(self, bow_q: np.ndarray, map_store) -> List[int]:
        """reference: KeyFrameDatabase::DetectRelocalizationCandidates
        (KeyFrameDatabase.cc:274-411) — same cascade without covisibility
        exclusion or minScore."""
        common, scores = self._common_words_and_scores(bow_q)
        common = np.where(self.active, common, 0)
        if common.max(initial=0) == 0:
            return []
        min_common = int(0.8 * common.max())
        cand = np.nonzero(self.active & (common > min_common))[0]
        if cand.size == 0:
            return []
        acc_scores = []
        for c in cand:
            group = [int(c)] + [int(x) for x in map_store.get_covisible(int(c), 10)]
            g = [x for x in group if self.active[x] and common[x] > min_common]
            acc = float(scores[g].sum()) if g else float(scores[c])
            best_in_group = int(max(g, key=lambda x: scores[x])) if g else int(c)
            acc_scores.append((acc, best_in_group))
        best_acc = max(a for a, _ in acc_scores)
        out = []
        seen = set()
        for acc, best_kf in acc_scores:
            if acc > 0.75 * best_acc and best_kf not in seen:
                seen.add(best_kf)
                out.append(best_kf)
        return out
