"""Binary bag-of-words vocabulary for place recognition.

TPU-native replacement for DBoW2's TemplatedVocabulary
(reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:135-241 and the
~140MB ORBvoc.txt the reference loads at startup, System.cc:78-94).

Design difference: DBoW2 uses a k-ary tree (k=10, L=6) because descending
a tree is the only way a CPU can quantize 2000 descriptors against 10^6
words in real time. On TPU the quantization IS a Hamming argmin over all
words — one +-1 matmul on the MXU — so we use a FLAT vocabulary (a few
thousand words) and keep the same TF-IDF weighting and L1 scoring. The
tree's second role in the reference (FeatureVector node grouping to
restrict brute-force matching, ORBmatcher::SearchByBoW) is unnecessary
here: matching is already a full masked MXU matmul.

The vocabulary is trained by binary k-medians (majority-bit voting) on
descriptors sampled from the running map — no external vocabulary file.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops.hamming import hamming_distance_matrix


def _popcount_np(x):
    return np.bitwise_count(x)


def _unpack_bits_np(desc):
    """(N, 8) uint32 -> (N, 256) uint8 bits."""
    bits = ((desc[:, :, None] >> np.arange(32, dtype=np.uint32)[None, None, :]) & 1)
    return bits.reshape(desc.shape[0], 256).astype(np.uint8)


def _pack_bits_np(bits):
    b = bits.reshape(-1, 8, 32).astype(np.uint32)
    return (b << np.arange(32, dtype=np.uint32)[None, None, :]).sum(axis=2).astype(np.uint32)


class BinaryVocabulary:
    """Flat binary vocabulary with TF-IDF weights and L1 scoring."""

    def __init__(self, words: np.ndarray, idf: Optional[np.ndarray] = None):
        self.words = np.asarray(words, np.uint32)        # (W, 8)
        self.n_words = self.words.shape[0]
        self.idf = (np.asarray(idf, np.float32) if idf is not None
                    else np.ones(self.n_words, np.float32))

    # ------------------------------------------------------------------

    @classmethod
    def train(cls, descriptors: np.ndarray, n_words: int = 2048,
              n_iters: int = 4, seed: int = 0) -> "BinaryVocabulary":
        """Binary k-medians: assign by Hamming distance, update centers by
        per-bit majority vote (the same center update DBoW2's training uses,
        FORB::meanValue)."""
        rng = np.random.default_rng(seed)
        desc = np.unique(descriptors, axis=0)
        if len(desc) < n_words:
            # duplicate-pad: degenerate but functional for tiny training sets
            reps = int(np.ceil(n_words / max(len(desc), 1)))
            desc = np.tile(desc, (reps, 1))[: max(n_words, len(desc))]
        centers = desc[rng.choice(len(desc), n_words, replace=False)]

        for _ in range(n_iters):
            d = np.asarray(hamming_distance_matrix(
                jnp.asarray(desc), jnp.asarray(centers)))
            assign = d.argmin(axis=1)
            bits = _unpack_bits_np(desc)
            sums = np.zeros((n_words, 256), np.int64)
            counts = np.zeros(n_words, np.int64)
            np.add.at(sums, assign, bits)
            np.add.at(counts, assign, 1)
            nonempty = counts > 0
            maj = (sums >= (counts[:, None] + 1) // 2).astype(np.uint8)
            new_centers = centers.copy()
            new_centers[nonempty] = _pack_bits_np(maj[nonempty])
            # re-seed empty clusters from random descriptors
            n_empty = int((~nonempty).sum())
            if n_empty:
                new_centers[~nonempty] = desc[rng.choice(len(desc), n_empty)]
            centers = new_centers

        # idf from training distribution
        d = np.asarray(hamming_distance_matrix(jnp.asarray(desc), jnp.asarray(centers)))
        assign = d.argmin(axis=1)
        df = np.bincount(assign, minlength=n_words).astype(np.float32)
        idf = np.log(len(desc) / np.maximum(df, 1.0))
        return cls(centers, idf)

    # ------------------------------------------------------------------

    def transform(self, desc: np.ndarray, valid: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Quantize descriptors -> (word_ids (N,), bow (W,) dense L1-normalized
        TF-IDF vector). Replaces TemplatedVocabulary::transform
        (reference: TemplatedVocabulary.h:192-241)."""
        d = np.asarray(hamming_distance_matrix(
            jnp.asarray(desc), jnp.asarray(self.words)))
        word_ids = d.argmin(axis=1).astype(np.int32)
        word_ids[~valid] = -1
        bow = np.zeros(self.n_words, np.float32)
        ok = word_ids[word_ids >= 0]
        np.add.at(bow, ok, 1.0)
        bow *= self.idf
        s = bow.sum()
        if s > 0:
            bow /= s
        return word_ids, bow

    @staticmethod
    def score(v1: np.ndarray, v2: np.ndarray) -> float:
        """DBoW2 L1 score: 1 - 0.5 |v1 - v2|_1 = sum_w min(v1, v2) for
        L1-normalized vectors (reference: ScoringObject.cc L1Scoring)."""
        return float(np.minimum(v1, v2).sum())

    def save(self, path: str) -> None:
        np.savez_compressed(path, words=self.words, idf=self.idf)

    @classmethod
    def load(cls, path: str) -> "BinaryVocabulary":
        data = np.load(path)
        return cls(data["words"], data["idf"])
