"""Mergeable distinct-count sketches (KMV / k-minimum-values).

The reference engine has no sketches (it counts small vocabularies in
RAM, e.g. the title census in ``Utils/utilities.py``); at 100 TB the
cardinality questions it answers exactly become sketch territory.
KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") is the sketch chosen here because — unlike HyperLogLog's
leading-zero registers — it is INTEGER-EXACT and fully SQL-replayable:
the sketch state is literally "the k smallest distinct md5-15 hashes",
an ``ORDER BY h LIMIT k`` in DuckDB, and the estimator is one integer
floor division, so the oracle reproduces the Ray result bit-for-bit.

Scale shape:
- per-BLOCK combiner: local distinct tokens → md5-15 int64 hashes →
  ``np.unique`` → k smallest. The exchange/driver never sees more
  than k rows per block regardless of block size;
- bounded driver merge: blocks × k int64 rows (1024 × 8 B per block),
  the same bounded-partial pattern as the engine's top-k and ANN
  merges — no full-vocabulary structure anywhere;
- estimator (all Python ints, no float, no int64 overflow):
  ``est = ((k-1) << 60) // h_k`` where ``h_k`` is the k-th smallest
  distinct hash over the 2^60 md5-15 space; when fewer than k
  distinct hashes exist the sketch has seen everything and the count
  is exact. Standard error ~ 1/sqrt(k-2) ≈ 3.1% at k=1024.

Tokenization is the engine-wide ``[a-z0-9]+``-over-lowercase
convention (SQL: ``regexp_extract_all(lower(text), '[a-z0-9]+')``);
distinctness is over the HASH (a ~1e-9 md5-15 collision merges two
tokens in Ray and in SQL identically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .graph import _h15

HASH_SPACE_BITS = 60  # md5-15-hex → [0, 2^60)


def _kmv_estimate(ds, local_kmin, k: int) -> pd.DataFrame:
    """Shared KMV finish: bounded driver merge of per-block k-min
    partials (≤ k int64 rows per block) + the integer estimator."""
    parts = [b["h"] for b in ds.map_batches(
        local_kmin, batch_format="pandas", batch_size=None)
        .iter_batches(batch_format="numpy", batch_size=None)]
    merged = (np.unique(np.concatenate(parts))
              if parts else np.empty(0, dtype=np.int64))
    sketch = merged[:k]

    n_sketch = int(len(sketch))
    if n_sketch == 0:
        est, kth = 0, 0
    elif n_sketch < k:
        est, kth = n_sketch, 0   # unsaturated: count is exact
    else:
        kth = int(sketch[-1])
        est = ((k - 1) << HASH_SPACE_BITS) // kth
    return pd.DataFrame({
        "est_distinct": pd.array([est], dtype="int64"),
        "kth_min_hash": pd.array([kth], dtype="int64"),
        "n_sketch": pd.array([n_sketch], dtype="int64")})


def kmv_distinct(ds, col: str, k: int = 1024) -> pd.DataFrame:
    """KMV distinct-count sketch of one column (any dtype; values are
    hashed via md5 of their string form, SQL
    ``md5(CAST(col AS VARCHAR))``).

    Returns ONE row: ``est_distinct`` (the KMV estimate — exact when
    the column has fewer than ``k`` distinct hashes),
    ``kth_min_hash`` (the sketch's threshold hash; 0 while the sketch
    is unsaturated) and ``n_sketch`` (hashes retained, ≤ k) — all
    int64, deterministic, and replayed bit-for-bit by the DuckDB
    oracle.
    """
    kk = int(k)

    def _local_kmin(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[col].dropna().astype(str).drop_duplicates()
        if not len(vals):
            return pd.DataFrame({"h": pd.array([], dtype="int64")})
        h = np.unique(_h15(vals))
        return pd.DataFrame({"h": h[:kk]})

    return _kmv_estimate(ds, _local_kmin, kk)


def kmv_distinct_tokens(docs, k: int = 1024,
                        text_col: str = "text") -> pd.DataFrame:
    """KMV distinct-TOKEN-count sketch over a document Dataset — the
    approximate twin of ``textstats.distinct_tokens``. Same contract
    as :func:`kmv_distinct`.
    """
    import re as _re

    word = _re.compile(r"[a-z0-9]+")
    kk = int(k)

    def _local_kmin(batch: pd.DataFrame) -> pd.DataFrame:
        s: set = set()
        for t in batch[text_col]:
            s.update(word.findall(str(t).lower()))
        if not s:
            return pd.DataFrame({"h": pd.array([], dtype="int64")})
        h = np.unique(_h15(pd.Series(sorted(s))))
        return pd.DataFrame({"h": h[:kk]})

    return _kmv_estimate(docs, _local_kmin, kk)
