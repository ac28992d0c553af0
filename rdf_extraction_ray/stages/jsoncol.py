"""Semi-structured (JSON string) column operators.

Web-scale event and document tables routinely carry a JSON "props" /
"metadata" string column; extracting typed fields from it is a
per-record parse that must still be vectorized. The kernel here is
polars' Rust-side ``str.json_path_match`` riding zero-copy on the
Arrow batch — no Python-level ``json.loads`` loop ever runs.

Reference analogue: the reference walks per-record attribute dicts in
Python (e.g. Biography/bio_extraction.py event attributes); here the
same "pull one field out of every record" step is a columnar batch
kernel.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

_DTYPES = {"int64", "float64", "str"}


def extract_json_field(ds: rd.Dataset, col: str, path: str,
                       out_col: str, dtype: str = "str") -> rd.Dataset:
    """Add ``out_col`` = JSON-path ``path`` of the JSON-string column
    ``col``. Missing keys / null documents yield typed nulls.

    Stateless ``map_batches`` over Arrow blocks; polars wraps the
    block zero-copy and runs the JSONPath match in Rust.
    """
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {_DTYPES}")

    def _extract(t: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(t.column(col)).str.json_path_match(path)
        if dtype == "int64":
            s = s.cast(pl.Int64)
        elif dtype == "float64":
            s = s.cast(pl.Float64)
        arr = s.rename(out_col).to_frame().to_arrow().column(out_col)
        return t.append_column(out_col, arr)

    return ds.map_batches(_extract, batch_format="pyarrow")


def json_field_stats(events: rd.Dataset, group_col: str = "event_type",
                     col: str = "props", path: str = "$.k",
                     ) -> pd.DataFrame:
    """Per-``group_col`` stats (n, sum, min, max, avg) of an integer
    JSON field.

    Scale shape: the JSON parse and a per-batch groupby are the
    combiner — the exchange carries one row per (batch, group), never
    one per event; the final merge is a groupby over the handful of
    distinct groups. Integer sums keep the result hash-exact; avg is
    derived at merge time.
    """
    extracted = extract_json_field(events, col, path, "__v", "int64")

    def _partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        # null fields drop ON THE ARROW TABLE: n/sum/min/max are over
        # PRESENT values (the SQL count(json_extract(...)) non-null
        # convention) — and filtering before to_pandas keeps "__v"
        # int64 end to end (a nullable column would convert to
        # float64+NaN and sum in floating point, losing exactness
        # past 2^53)
        sub = t.select([group_col, "__v"])
        df = sub.filter(pc.is_valid(sub.column("__v"))).to_pandas()
        g = df.groupby(group_col)["__v"]
        out = g.agg(n="count", s="sum", mn="min", mx="max")
        return out.reset_index().astype(
            {"n": "int64", "s": "int64", "mn": "int64", "mx": "int64"})

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group_col: [df[group_col].iloc[0]],
            "n": pd.array([df["n"].sum()], dtype="int64"),
            "sum_k": pd.array([df["s"].sum()], dtype="int64"),
            "min_k": pd.array([df["mn"].min()], dtype="int64"),
            "max_k": pd.array([df["mx"].max()], dtype="int64"),
            "avg_k": pd.array([df["s"].sum() / df["n"].sum()],
                              dtype="float64"),
        })

    out = (extracted.map_batches(_partial, batch_format="pyarrow")
           .groupby(group_col).map_groups(_merge,
                                          batch_format="pandas")
           .to_pandas())
    if out.empty:  # empty input: typed empty result
        return pd.DataFrame({
            group_col: pd.Series([], dtype=object),
            "n": pd.Series([], dtype="int64"),
            "sum_k": pd.Series([], dtype="int64"),
            "min_k": pd.Series([], dtype="int64"),
            "max_k": pd.Series([], dtype="int64"),
            "avg_k": pd.Series([], dtype="float64")})
    return out.sort_values(group_col, ignore_index=True)
