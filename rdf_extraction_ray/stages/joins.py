"""Join operators (SURVEY §2.5).

The reference's joins are ALL broadcast-small-side dictionary lookups
(27k CSV rows); the engine generalizes to three join shapes:

- :func:`broadcast_join` — small side shipped once via ``ray.put``,
  merged per batch inside ``map_batches``. No shuffle. This is the
  engine-native form of every reference join (J1-J7, J9).
- :func:`hash_join` — both sides large: explicit partitioned hash
  join. Each side gets a deterministic ``__bucket`` column
  (``hash(key) % n_buckets``), the tagged union is grouped by bucket,
  and matching buckets merge pairwise with a vectorized pandas merge
  inside ``map_groups``. One shuffle each side; skewed keys can be
  salted by raising ``n_buckets``. (Ray's experimental
  ``Dataset.join`` exists in this version; we keep an explicit
  implementation so the partitioning contract is visible and
  portable.)
- semi/anti join: broadcast the key set and filter (used by the
  pipeline's resume anti-join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _bucket(series: pd.Series, n: int) -> pd.Series:
    return (pd.util.hash_pandas_object(series, index=False) % n).astype("int64")


def broadcast_join(large: rd.Dataset, small_df: pd.DataFrame, on: str | list,
                   how: str = "inner", suffix: str = "_r") -> rd.Dataset:
    """Merge a small pandas table into every batch of ``large``.

    The small side is put in the object store ONCE; each task reads it
    zero-copy instead of re-shipping it per batch (per-task closure
    capture of a ref is cheap; ``ray.get`` inside the task dedups).
    """
    ref = ray.put(small_df)

    def _merge(batch: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(ref)
        return batch.merge(right, on=on, how=how, suffixes=("", suffix))

    return large.map_batches(_merge, batch_format="pandas")


def semi_join_filter(large: rd.Dataset, keys, column: str,
                     anti: bool = False) -> rd.Dataset:
    """Keep rows whose ``column`` is (not) in ``keys`` — broadcast set."""
    ref = ray.put(frozenset(keys))

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        keyset = ray.get(ref)
        mask = batch[column].isin(keyset)
        return batch[~mask] if anti else batch[mask]

    return large.map_batches(_filter, batch_format="pandas")


def asof_join(left: rd.Dataset, right: rd.Dataset, by: str, on: str,
              n_buckets: int = 32, suffix: str = "_r") -> rd.Dataset:
    """As-of (nearest-prior) join: for each left row, the latest right
    row with the same ``by`` key and ``right.on <= left.on``
    (inclusive). Rows with no prior match are dropped (inner asof).

    A custom operator Ray Data lacks: both sides hash-partition on
    ``by`` (all rows of one key co-locate — the partitioning
    assumption), then each bucket runs a vectorized
    ``pandas.merge_asof`` under a stable per-bucket sort on ``on``.
    One shuffle each side, |left|+|right| rows once.
    """
    left_cols = left.schema().names
    right_cols = right.schema().names

    def _tag(side: int):
        all_cols = left_cols + [c for c in right_cols if c not in left_cols]

        def inner(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.copy()
            b["__bucket"] = _bucket(b[by], n_buckets)
            b["__side"] = side
            for c in all_cols:
                if c not in b.columns:
                    b[c] = None
            return b[all_cols + ["__bucket", "__side"]]
        return inner

    tagged = left.map_batches(_tag(0), batch_format="pandas") \
        .union(right.map_batches(_tag(1), batch_format="pandas"))

    # output schema is fixed up front so every bucket (incl. one-sided
    # ones) emits identical columns; merge_asof consumes the right
    # side's `on`, the rest of its columns collide-suffix as usual
    out_cols = left_cols + [c + suffix if c in left_cols else c
                            for c in right_cols if c not in (by, on)]

    def _merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = (group.loc[group["__side"] == 0, left_cols]
             .sort_values(on, kind="stable"))
        r = (group.loc[group["__side"] == 1, right_cols]
             .sort_values(on, kind="stable"))
        if not len(l) or not len(r):
            return pd.DataFrame(columns=out_cols)
        # explicit matched indicator: NEVER probe a value column (a
        # legitimately-null right value is not a failed match)
        r = r.assign(__rmatch=np.int8(1))
        out = pd.merge_asof(l, r, on=on, by=by, direction="backward",
                            suffixes=("", suffix))
        out = out[out["__rmatch"].notna()].drop(columns=["__rmatch"])
        return out[out_cols]

    return tagged.groupby("__bucket").map_groups(_merge_bucket,
                                                 batch_format="pandas")


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str | list[str],
              how: str = "inner", n_buckets: int = 32,
              suffix: str = "_r") -> rd.Dataset:
    """Partitioned hash join of two Datasets on ``on``.

    Both sides are tagged (``__side``), bucketed on the key hash,
    unioned, grouped by bucket, and merged pairwise per bucket. The
    shuffle volume is |left| + |right| rows, once.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    left_cols = left.schema().names
    right_cols = right.schema().names
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def _tag(side: int):
        def inner(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.copy()
            key = b[on_cols].astype(str).agg("|".join, axis=1) \
                if len(on_cols) > 1 else b[on_cols[0]]
            b["__bucket"] = _bucket(key, n_buckets)
            b["__side"] = side
            for c in all_cols:  # pad to the union schema so union() is clean
                if c not in b.columns:
                    b[c] = None
            return b[all_cols + ["__bucket", "__side"]]
        return inner

    tagged = left.map_batches(_tag(0), batch_format="pandas").union(
        right.map_batches(_tag(1), batch_format="pandas"))

    def _merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group.loc[group["__side"] == 0, left_cols]
        r = group.loc[group["__side"] == 1, right_cols]
        return l.merge(r, on=on_cols, how=how, suffixes=("", suffix))

    return tagged.groupby("__bucket").map_groups(_merge_bucket,
                                                 batch_format="pandas")
