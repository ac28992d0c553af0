"""Grouping-set aggregations (ROLLUP / CUBE), reshaping (pivot) and
per-group mode.

``rollup_sum`` computes count + sums at every PREFIX level of the key
list — (k1, k2), (k1), () — the SQL ``GROUP BY ROLLUP`` shape;
``cube_sum`` at every SUBSET (``GROUP BY CUBE``). Both ride one
shared grouping-sets engine: one combiner pass over the raw rows
feeds the FINEST groupby; every other grouping set is then derived
from the materialized finest aggregate, never from a re-scan — the
exchanges above the first one move only aggregate rows (one per
distinct finest key), so the cost is one scan + small shuffles
regardless of how many grouping sets exist.

Null-key precondition: rows whose key columns are null are excluded
(pandas groupby dropna). The sentinel encoding cannot represent them
unambiguously — in SQL, ``coalesce(key, '__all__')`` under ROLLUP
folds a data-level NULL group onto the rolled-up rows just the same —
so fill or drop nulls upstream if they carry meaning.

Reference analogue: the reference's report counters (mapping-failure
histograms plus their per-run totals, Utils/utilities.py counters)
are a two-level rollup computed in one pass here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Sum

ALL = "__all__"

#: Rows at which the finest grouping-set aggregate finishes on the
#: driver (replicate + one pandas groupby) instead of paying a second
#: distributed bucket_sum exchange. The finest level is one row per
#: distinct full-key tuple, already reduced — 1M rows × a few columns
#: is tens of MB, comfortably driver-sized; past the cap the
#: distributed coarser path runs unchanged.
DRIVER_FINISH_CAP = 1_000_000


def bucket_sum(ds: rd.Dataset, keys: list[str], sum_cols: list[str],
               n_buckets: int = 64) -> rd.Dataset:
    """Exact per-key-tuple column sums via a HASH-BUCKET exchange:
    rows group on ``hash(keys) % n_buckets`` and the true groupby
    runs vectorized inside each bucket group.

    This exists because Ray's ``groupby(keys).aggregate(Sum(...))``
    pays per-distinct-key overhead in its reduce — measured 18 s vs
    0.8 s for this form at 3.6k keys over 300k rows — so any
    aggregation whose key cardinality exceeds a few hundred should
    take this path. A key tuple lives in exactly one bucket, so the
    bucket-local sums are globally exact.
    """

    def _bk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__bk"] = (pd.util.hash_pandas_object(
            out[keys], index=False) % n_buckets).astype("int64")
        return out

    def _sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False)[sum_cols].sum()

    return (ds.map_batches(_bk, batch_format="pandas")
            .groupby("__bk").map_groups(_sum, batch_format="pandas"))


def _grouping_sets(ds: rd.Dataset, keys: list[str],
                   sum_cols: list[str],
                   subsets: list[tuple]) -> pd.DataFrame:
    """Shared engine: count + sums at the finest (full-key) level
    plus each grouping set in ``subsets`` (tuples of key names; the
    full-key tuple is implied and must not be listed)."""
    if not sum_cols:
        raise ValueError("grouping-set aggregation needs at least "
                         "one sum column")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n=(sum_cols[0], "size"),
            **{c: (c, "sum") for c in sum_cols})
        return g.astype({"n": "int64"})

    # materialize the finest level: it is BOUNDED (one row per
    # distinct key tuple) and every other grouping set re-aggregates
    # it — without this, each union branch would lazily re-run the
    # raw scan. bucket_sum, not groupby().aggregate(): key
    # cardinality is unbounded here
    finest = bucket_sum(ds.map_batches(_partial,
                                       batch_format="pandas"),
                        keys, ["n"] + sum_cols).materialize()
    n_finest = finest.count()

    if not n_finest:
        # on EMPTY input SQL still yields the one grand-total row
        # (n=0, NULL sums) — mirror it
        row = {k: ALL for k in keys}
        row["n"] = 0
        row.update({c: np.nan for c in sum_cols})
        df = pd.DataFrame([row]).astype({"n": "int64"})
        return (df[keys + ["n"] + sum_cols]
                .sort_values(keys, ignore_index=True))

    def _expand(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for sub in subsets:
            out = df.copy()
            for k in keys:
                if k not in sub:
                    out[k] = ALL
            outs.append(out)
        return pd.concat(outs, ignore_index=True)

    if n_finest <= DRIVER_FINISH_CAP:
        # the finest aggregate is small enough to finish on the
        # driver: replicate + one pandas groupby, ZERO further
        # exchanges (the distributed path below pays a second
        # bucket_sum barrier that is pure overhead at this size)
        fdf = finest.to_pandas()
        df = (pd.concat([fdf, _expand(fdf)], ignore_index=True)
              .groupby(keys, as_index=False)[["n"] + sum_cols].sum())
        df["n"] = df["n"].astype("int64")
        return (df[keys + ["n"] + sum_cols]
                .sort_values(keys, ignore_index=True))

    # ONE exchange for every coarser grouping set: replicate each
    # finest aggregate row once per set with the rolled-up key slots
    # sentinel-filled, then a single groupby over the full key tuple
    # reduces all sets at once — the barrier count stays constant as
    # sets grow (a per-set groupby costs CUBE 2^k barriers)
    coarser = bucket_sum(finest.map_batches(_expand,
                                            batch_format="pandas"),
                         keys, ["n"] + sum_cols)
    df = finest.union(coarser).to_pandas()
    df["n"] = df["n"].astype("int64")
    return (df[keys + ["n"] + sum_cols]
            .sort_values(keys, ignore_index=True))


def rollup_sum(ds: rd.Dataset, keys: list[str],
               sum_cols: list[str]) -> pd.DataFrame:
    """Count + per-column sums at every prefix level of ``keys``
    (``GROUP BY ROLLUP``). Rolled-up key slots hold ``"__all__"``
    (the DuckDB oracle spells it ``coalesce(key, '__all__')``); only
    aggregate rows reach the driver."""
    subsets = [tuple(keys[:i]) for i in range(len(keys) - 1, -1, -1)]
    return _grouping_sets(ds, keys, sum_cols, subsets)


def cube_sum(ds: rd.Dataset, keys: list[str],
             sum_cols: list[str]) -> pd.DataFrame:
    """Count + per-column sums at EVERY SUBSET of ``keys`` (2^k
    grouping sets — ``GROUP BY CUBE``), sentinel-encoded like
    :func:`rollup_sum`. One raw scan regardless of k."""
    from itertools import combinations

    subsets = [sub for r in range(len(keys) - 1, -1, -1)
               for sub in combinations(keys, r)]
    return _grouping_sets(ds, keys, sum_cols, subsets)


def pivot_counts(ds: rd.Dataset, index: str, col: str,
                 col_values: list[str] | None = None) -> pd.DataFrame:
    """Long→wide reshape: one row per ``index`` value, one int64
    count column per distinct ``col`` value.

    Scale shape: the column universe is discovered with a per-batch
    unique combiner (bounded by batches x distinct values — pivots
    only make sense for small column universes, which is also what
    keeps the wide schema sane); each batch then crosstabs locally so
    the exchange carries one already-wide row per (batch, index
    value), and a groupby sums the wide partials. Row cardinality
    (|index|) can be huge — it streams; column cardinality must be
    small — it is schema.
    """

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[[index, col]].assign(**{col: df[col].astype(str)})
             .groupby([index, col], as_index=False)
             .size().rename(columns={"size": "n"}))
        return g.astype({"n": "int64"})

    # ONE pass: per-batch LONG (index, col, n) combiner partials need
    # no upfront column-universe scan (the old shape paid a second
    # full read just to discover the columns before it could
    # crosstab); one bucket exchange reduces to |index|×|col| rows
    # and the driver widens that bounded aggregate
    long = bucket_sum(ds.map_batches(_partial, batch_format="pandas"),
                      [index, col], ["n"]).to_pandas()
    if long.empty:
        if not col_values:
            return pd.DataFrame({index: pd.Series([], dtype=object)})
        return pd.DataFrame(
            {index: pd.Series([], dtype=object),
             **{str(v): pd.Series([], dtype="int64")
                for v in col_values}})
    wide = long.pivot_table(index=index, columns=col, values="n",
                            fill_value=0, aggfunc="sum")
    if col_values is None:
        col_values = sorted(map(str, wide.columns))
    wide = (wide.reindex(columns=col_values, fill_value=0)
            .astype("int64").reset_index().rename(columns=str))
    wide.columns.name = None
    return wide.sort_values(index, ignore_index=True)


def group_mode(ds: rd.Dataset, key: str, col: str,
               n_buckets: int = 64) -> pd.DataFrame:
    """Per-group MODE with deterministic tie-break: the most frequent
    ``col`` value per ``key`` (count desc, value asc — the SQL
    row_number() over (count DESC, value) form).

    Scale shape: (key, value) counts are the combiner; the exchange
    buckets on the KEY hash so each group's full histogram is local
    to one ``map_groups`` call; one row per key reaches the driver.
    """

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[[key, col]].groupby([key, col], as_index=False)
             .size().rename(columns={"size": "n"}))
        g["kbucket"] = (pd.util.hash_pandas_object(
            g[key], index=False) % n_buckets).astype("int64")
        return g.astype({"n": "int64"})

    def _mode(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby([key, col], as_index=False)["n"].sum()
        g = g.sort_values(["n", col], ascending=[False, True],
                          kind="stable")
        top = g.groupby(key, as_index=False).head(1)
        return (top.rename(columns={col: "mode", "n": "mode_n"})
                [[key, "mode", "mode_n"]])

    out = (ds.map_batches(_partial, batch_format="pandas")
           .groupby("kbucket").map_groups(_mode, batch_format="pandas")
           .to_pandas())
    if out.empty:  # empty input: typed empty result
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "mode": pd.Series([], dtype=object),
                             "mode_n": pd.Series([], dtype="int64")})
    return out.sort_values(key, ignore_index=True)
