"""Co-partitioned (bucketed) storage layout — the shuffle-avoidance
pattern for repeated joins at 100 TB: hash-bucket both tables by the
SAME key once at write time, then every subsequent join on that key is
embarrassingly parallel (one task per bucket reads both sides' bucket
files and joins locally — ZERO exchange, no matter how many times the
join runs or how large the tables are).

This is the storage-side twin of ``stages/joins.hash_join``: the
exchange that hash_join pays per run is paid ONCE here, at layout
time, and amortized over every downstream join/groupby on the same
key. Spark calls this bucketing; the reference (single rdflib graph in
RAM, ``Utils/utilities.py``) has no analogue.

Scale shapes:
- :func:`write_bucketed` — one streaming pass, ``partition_cols``
  sink; the bucket column is a pure hash of the key, so co-partition
  compatibility only needs (key, n_buckets) to match.
- :func:`bucketed_join` — a Dataset of bucket ids fans out one task
  per bucket; each task's working set is ~1/n_buckets of each table
  (size n_buckets so that fits a worker heap). Reads happen INSIDE
  the tasks — the driver never touches table bytes.
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd

_EMPTY_MARK = "_BUCKETS.json"


def write_bucketed(ds: rd.Dataset, path: str, key: str,
                   n_buckets: int = 32) -> str:
    """Materialize ``ds`` hash-bucketed by ``key`` under ``path``
    (``kbucket=<b>/`` directories). Atomic publish — directory
    existence is the done-marker (concurrent writers race safely,
    loser discards). Returns ``path``."""
    import json
    import shutil

    if os.path.exists(path):
        return path
    tmp = f"{path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    def _tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["kbucket"] = (pd.util.hash_pandas_object(
            batch[key], index=False).astype("int64").abs()
            % n_buckets).astype("int64")
        return out

    ds.map_batches(_tag, batch_format="pandas").write_parquet(
        tmp, partition_cols=["kbucket"])
    with open(os.path.join(tmp, _EMPTY_MARK), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)
    try:
        os.rename(tmp, path)
    except OSError:
        if not os.path.exists(path):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def bucketed_join(path_a: str, path_b: str, key: str,
                  n_buckets: int = 32,
                  columns_a: list[str] | None = None,
                  columns_b: list[str] | None = None) -> rd.Dataset:
    """Join two co-bucketed layouts on ``key`` with NO shuffle: one
    task per bucket id reads both sides' ``kbucket=<b>`` files and
    merges locally. Both layouts must have been written by
    :func:`write_bucketed` with the same (key, n_buckets) — the
    co-partitioning contract this operator relies on."""

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq
        parts = []
        for b in batch["bucket_id"]:
            da = os.path.join(path_a, f"kbucket={int(b)}")
            db = os.path.join(path_b, f"kbucket={int(b)}")
            if not (os.path.isdir(da) and os.path.isdir(db)):
                continue  # a side had no rows for this bucket
            a = pq.read_table(da, columns=columns_a).to_pandas()
            c = pq.read_table(db, columns=columns_b).to_pandas()
            parts.append(a.merge(c, on=key))
        if not parts:
            return pd.DataFrame()  # schema seeded by non-empty buckets
        return pd.concat(parts, ignore_index=True)

    ids = rd.from_items([{"bucket_id": b} for b in range(n_buckets)])
    return ids.map_batches(_join, batch_format="pandas", batch_size=1)
