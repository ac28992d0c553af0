"""Exact triple dedup — the engine's analogue of rdflib set semantics.

The reference gets corpus-wide dedup for free by folding every
per-person graph into one in-RAM ``uber_graph`` (rdflib graphs are
sets, ``bio_extraction.py:78``) — unbounded driver memory. Here it is
a two-level distributed dedup (SURVEY §2.6 A1, §7.4):

1. **combiner** (:func:`add_bucket_and_combine`): vectorized
   ``drop_duplicates`` inside each ``map_batches`` batch — kills local
   duplicates before anything shuffles — plus a deterministic 64-bit
   row hash bucketed to ``N_DEDUP_BUCKETS``;
2. **hash shuffle**: ``groupby("bucket").map_groups`` — B groups (not
   one per distinct triple!), each running one vectorized
   ``drop_duplicates`` over the full key columns (collision-safe: the
   hash only routes, equality decides).

Only the first occurrence's provenance ``(conv_id, turn_idx)`` is kept
(deterministic: min (conv_id, turn_idx) per triple key) so reruns are
stable regardless of block order.
"""

from __future__ import annotations

import pandas as pd

TRIPLE_KEY = ["subj", "pred", "obj", "obj_kind", "obj_lang", "obj_datatype"]

# dedup-shuffle fan-out; sized for parallelism / per-group memory, not
# row count (each bucket holds ~1/B of distinct triples)
N_DEDUP_BUCKETS = 128


def add_bucket_and_combine(batch: pd.DataFrame):
    """map_batches combiner: local dedup + deterministic hash bucket.

    Returns an ARROW table: the combiner's output is exactly what the
    dedup exchange ships, and Arrow string blocks are ~3x smaller than
    pandas object blocks (measured 3.5 GB → 1.2 GB at 6M triples,
    shuffle 7.7s → 5.5s at 32 CPUs)."""
    import pyarrow as pa

    from ..namespaces import TRIPLE_COLUMNS
    b = (batch.sort_values(["conv_id", "turn_idx"], kind="stable")
         .drop_duplicates(TRIPLE_KEY, keep="first"))
    # bucket on a SUBSET of the key: rows equal on the full 6-column
    # key are equal on (subj, obj), so all duplicates still co-locate
    # — and hashing 2 string columns instead of 6 was the hottest
    # kernel in the whole headline profile (2.9s -> ~1s at 2.7M rows).
    # Equality in dedup_bucket still checks the FULL key.
    key = b[["subj", "obj"]].fillna("")
    h = pd.util.hash_pandas_object(key, index=False)
    b = b.assign(bucket=(h % N_DEDUP_BUCKETS).astype("int32"))
    # explicit schema: an all-null column (e.g. obj_lang in one block)
    # must stay string, never infer to pa.null and wobble the schema
    return pa.table({c: pa.array(b[c], from_pandas=True,
                                 type=pa.int32() if c in ("turn_idx",
                                                          "bucket")
                                 else pa.string())
                     for c in TRIPLE_COLUMNS + ["bucket"]})


def dedup_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups body per hash bucket: collision-safe exact dedup,
    deterministic winner = smallest (conv_id, turn_idx)."""
    return (group.sort_values(["conv_id", "turn_idx"], kind="stable")
            .drop_duplicates(TRIPLE_KEY, keep="first")
            .drop(columns=["bucket"]))


def dedup_triples(ds):
    """Compose the two levels on a Dataset of triple rows."""
    ds = ds.map_batches(add_bucket_and_combine, batch_format="pandas",
                        batch_size=None)  # combine per block
    return ds.groupby("bucket").map_groups(dedup_bucket,
                                           batch_format="pandas")
