"""Fuzzy (edit-distance) matching against a small canonical vocabulary.

The reference substitutes fuzzily matched place names in its
bibliography pipeline (Mods/modsBib.py place mapper, fuzz.ratio >= 95)
and runs diagnostic close-match checks on vocab misses
(Utils/culturalForm.py:589-591). This stage is that operation as a
distributed broadcast join: the vocabulary is tiny and known, every
batch matches its DISTINCT surfaces against it with an exact
Levenshtein kernel, and no shuffle is needed.

The kernel is Wagner-Fischer vectorized ACROSS THE VOCABULARY: one
numpy DP row per query character covering all vocab words at once —
O(len(surface) x max_vocab_len) numpy ops per distinct surface, never
a Python loop over (surface, vocab) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

NO_MATCH = ""
NO_DIST = -1


class VocabMatcher:
    """Actor-pool stage: vocab char matrix built once per actor in
    ``__init__``; ``__call__`` matches each batch's DISTINCT surfaces
    with a per-actor memo (batches repeat surfaces heavily, so the
    cost is distinct-value cardinality — the same memoization the
    reference's fuzzy lookups rely on)."""

    def __init__(self, vocab: list[str], max_dist: int = 1,
                 col: str = "source"):
        self.vocab = sorted(vocab)  # ties break to the smallest term
        self.max_dist = int(max_dist)
        self.col = col
        self.lmax = max(len(v) for v in self.vocab)
        chars = np.full((len(self.vocab), self.lmax), -1,
                        dtype=np.int64)
        for i, v in enumerate(self.vocab):
            chars[i, :len(v)] = np.frombuffer(
                v.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        self.chars = chars
        self.lens = np.array([len(v) for v in self.vocab],
                             dtype=np.int64)
        self.memo: dict[str, tuple[str, int]] = {}

    def _best(self, s: str) -> tuple[str, int]:
        got = self.memo.get(s)
        if got is not None:
            return got
        sq = np.frombuffer(s.encode("utf-32-le"),
                           dtype=np.uint32).astype(np.int64)
        nv, lm = self.chars.shape
        prev = np.broadcast_to(np.arange(lm + 1, dtype=np.int64),
                               (nv, lm + 1)).copy()
        for i, c in enumerate(sq):
            cur = np.empty_like(prev)
            cur[:, 0] = i + 1
            sub = (self.chars != c).astype(np.int64)
            for j in range(1, lm + 1):
                cur[:, j] = np.minimum(
                    np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                    prev[:, j - 1] + sub[:, j - 1])
            prev = cur
        d = prev[np.arange(nv), self.lens]
        k = int(np.argmin(d))  # first index = smallest term on ties
        out = ((self.vocab[k], int(d[k])) if d[k] <= self.max_dist
               else (NO_MATCH, NO_DIST))
        self.memo[s] = out
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        uniq = {s: self._best(str(s))
                for s in batch[self.col].unique()}
        out = batch.copy()
        out["match"] = batch[self.col].map(lambda s: uniq[s][0])
        out["dist"] = (batch[self.col].map(lambda s: uniq[s][1])
                       .astype("int64"))
        return out


def fuzzy_match_vocab(ds: rd.Dataset, col: str, vocab: list[str],
                      max_dist: int = 1,
                      concurrency: int = 4) -> rd.Dataset:
    """Add (match, dist) columns: the edit-distance-nearest vocab term
    within ``max_dist`` (ties to the lexicographically smallest term),
    or ('', -1) when nothing is close enough.

    Broadcast shape: the vocab ships once per ACTOR via the
    constructor — the small side never shuffles and never re-ships
    per batch.
    """
    if not vocab:
        # fail on the driver, not as an opaque actor-constructor death
        raise ValueError("fuzzy_match_vocab needs a non-empty vocab")
    return ds.map_batches(VocabMatcher,
                          fn_constructor_args=(vocab, max_dist, col),
                          batch_format="pandas",
                          concurrency=concurrency)
