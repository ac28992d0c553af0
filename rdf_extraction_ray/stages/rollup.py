"""Hierarchical (ROLLUP) aggregation.

``rollup_sum`` computes count + sums at EVERY prefix level of the key
list — (k1, k2), (k1), () — the SQL ``GROUP BY ROLLUP`` shape, with
coarser levels carrying a sentinel label in the rolled-up key columns.

Scale shape: one combiner pass over the raw rows feeds the FINEST
groupby; every coarser level is then derived from the finest
aggregate, never from a re-scan — the exchanges above the first one
move only aggregate rows (one per distinct finest key), so the cost
of the whole rollup is one scan + log-ish small shuffles.

Reference analogue: the reference's report counters (mapping-failure
histograms plus their per-run totals, Utils/utilities.py counters)
are a two-level rollup computed in one pass here.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd
from ray.data.aggregate import Sum

ALL = "__all__"


def _fill_sentinel(df: pd.DataFrame, keys: list[str],
                   keep: int) -> pd.DataFrame:
    out = df.copy()
    for k in keys[keep:]:
        out[k] = ALL
    return out


def rollup_sum(ds: rd.Dataset, keys: list[str],
               sum_cols: list[str]) -> pd.DataFrame:
    """Count + per-column sums at every prefix level of ``keys``.

    Returns a pandas DataFrame with columns ``keys + ["n"] +
    sum_cols``; rolled-up key slots hold the ``"__all__"`` sentinel
    (the DuckDB oracle spells it ``coalesce(key, '__all__')`` under
    ``GROUP BY ROLLUP``). Only aggregate rows reach the driver.
    """

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n=(sum_cols[0], "size"),
            **{c: (c, "sum") for c in sum_cols})
        return g.astype({"n": "int64"})

    # materialize each aggregate level: it is BOUNDED (one row per
    # distinct key, never per input row), and without it every union
    # branch would lazily re-execute the shared raw scan per level
    finest = (ds.map_batches(_partial, batch_format="pandas")
              .groupby(keys)
              .aggregate(Sum("n", alias_name="n"),
                         *[Sum(c, alias_name=c) for c in sum_cols])
              .materialize())

    levels = [finest.map_batches(
        lambda df: _fill_sentinel(df, keys, len(keys)),
        batch_format="pandas")]
    coarser = finest
    for keep in range(len(keys) - 1, -1, -1):
        sub = keys[:keep]
        if sub:
            coarser = (coarser.groupby(sub)
                       .aggregate(Sum("n", alias_name="n"),
                                  *[Sum(c, alias_name=c)
                                    for c in sum_cols])
                       .materialize())
            lvl = coarser.map_batches(
                lambda df, _keep=keep: _fill_sentinel(df, keys, _keep),
                batch_format="pandas")
        else:
            tot = coarser.aggregate(Sum("n", alias_name="n"),
                                    *[Sum(c, alias_name=c)
                                      for c in sum_cols])
            row = {k: ALL for k in keys}
            row.update({c: tot[c] for c in ["n"] + sum_cols})
            lvl = rd.from_pandas(pd.DataFrame([row]).astype(
                {"n": "int64"}))
        levels.append(lvl)

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    df = out.to_pandas()
    df["n"] = df["n"].astype("int64")
    return (df[keys + ["n"] + sum_cols]
            .sort_values(keys, ignore_index=True))


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

    if col_values is None:
        uniq = (ds.map_batches(
            lambda df: pd.DataFrame({col: df[col].unique()}),
            batch_format="pandas").to_pandas())
        col_values = sorted(map(str, uniq[col].unique()))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df[index], df[col].astype(str))
        ct = ct.reindex(columns=col_values, fill_value=0)
        return (ct.astype("int64").reset_index()
                .rename(columns=str))

    wide = (ds.map_batches(_partial, batch_format="pandas")
            .groupby(index)
            .aggregate(*[Sum(v, alias_name=v) for v in col_values])
            .to_pandas())
    for v in col_values:
        wide[v] = wide[v].astype("int64")
    return wide.sort_values(index, ignore_index=True)


def cube_sum(ds: rd.Dataset, keys: list[str],
             sum_cols: list[str]) -> pd.DataFrame:
    """``GROUP BY CUBE`` — count + sums at EVERY SUBSET of ``keys``
    (2^k grouping sets), rolled-up slots holding the sentinel.

    Scale shape: one combiner scan feeds the finest groupby
    (materialized — bounded at one row per distinct key tuple); every
    other grouping set derives from those aggregate rows, so the
    input is scanned exactly once regardless of k.
    """
    from itertools import combinations

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n=(sum_cols[0], "size"),
            **{c: (c, "sum") for c in sum_cols})
        return g.astype({"n": "int64"})

    aggs = [Sum("n", alias_name="n")] + [Sum(c, alias_name=c)
                                         for c in sum_cols]
    finest = (ds.map_batches(_partial, batch_format="pandas")
              .groupby(keys).aggregate(*aggs).materialize())

    def _mask(sub: tuple) -> "rd.Dataset":
        def _fill(df: pd.DataFrame, _sub=sub) -> pd.DataFrame:
            out = df.copy()
            for k in keys:
                if k not in _sub:
                    out[k] = ALL
            return out

        if sub:
            return (finest.groupby(list(sub)).aggregate(*aggs)
                    .map_batches(_fill, batch_format="pandas"))
        tot = finest.aggregate(*aggs)
        row = {k: ALL for k in keys}
        row.update({c: tot[c] for c in ["n"] + sum_cols})
        return rd.from_pandas(pd.DataFrame([row]).astype({"n": "int64"}))

    levels = [finest.map_batches(
        lambda df: df.copy(), batch_format="pandas")]
    for r in range(len(keys) - 1, -1, -1):
        for sub in combinations(keys, r):
            levels.append(_mask(sub))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    df = out.to_pandas()
    df["n"] = df["n"].astype("int64")
    return (df[keys + ["n"] + sum_cols]
            .sort_values(keys, ignore_index=True))


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
    return out.sort_values(key, ignore_index=True)
