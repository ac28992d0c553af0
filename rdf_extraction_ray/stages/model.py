"""Batched model scoring over document batches — the fastText-style
quality-classifier stage of a training-data pipeline (reference has no
model stage; this is part of the LLM-curation suite).

The "model" here is a deterministic integer linear classifier so the
DuckDB oracle can replay the exact scores — the RAY-SIDE SHAPE is the
point and is exactly what a real model needs: weights load ONCE per
actor in ``__init__`` (swap in a fasttext/ONNX load there), inference
is a vectorized matmul over the whole batch in ``__call__``, and the
stage runs as ``map_batches(QualityModel, concurrency=N,
batch_size=B)`` — an actor pool, never a per-batch model load. A real
GPU model would add ``num_gpus=``; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: integer feature weights (w · x, fixed-point "logit"): words,
#: punctuation, uppercase letters, chars//10, bias
QUALITY_WEIGHTS = np.array([3, -2, -1, 1], dtype=np.int64)
QUALITY_BIAS = np.int64(40)

_TOKEN_RE = r"[A-Za-z0-9_]+"


class QualityModel:
    """Actor-pool stage: per-doc integer quality logit + keep label.

    Output columns: (doc_id, score, keep) — ``score`` is the exact
    integer w·x + bias, ``keep`` is ``score >= 0``.
    """

    def __init__(self) -> None:
        # once per actor: the "model load" (a real stage would read a
        # checkpoint here; the weights are module constants so every
        # actor scores identically)
        self.w = QUALITY_WEIGHTS.copy()
        self.b = QUALITY_BIAS

    def features(self, texts: pd.Series) -> np.ndarray:
        """(n, 4) int64 feature matrix, vectorized pandas kernels."""
        s = texts.fillna("")
        return np.stack([
            s.str.count(_TOKEN_RE).to_numpy(dtype=np.int64),
            s.str.count(r"[.!?,;:]").to_numpy(dtype=np.int64),
            s.str.count(r"[A-Z]").to_numpy(dtype=np.int64),
            s.str.len().to_numpy(dtype=np.int64) // 10,
        ], axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        x = self.features(batch["text"])
        score = x @ self.w + self.b
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64").to_numpy(),
            "score": score,
            "keep": score >= 0,
        })
