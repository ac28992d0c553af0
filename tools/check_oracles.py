"""Local mirror of the driver's correctness gate: run every queries()
entry at a given sf, compare against oracle_sql() via DuckDB
(row count + sorted-column value frame equality).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray


def to_df(res):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif df[c].dtype == bool or str(df[c].dtype) in ("boolean",):
            df[c] = df[c].astype(bool)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable",
                          ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"[ERR ] unknown query name(s): {sorted(unknown)}")
        sys.exit(2)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            mine = canon(to_df(fn(sf_dir)))
        except Exception as e:
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows] {name}: {len(mine)} rows ({dt:.1f}s, no oracle)")
            continue
        try:
            ref = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"[ERR ] {name} oracle: {e}")
            failures += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"[FAIL] {name}: columns {list(mine.columns)} != "
                  f"{list(ref.columns)}")
            failures += 1
        elif len(mine) != len(ref):
            print(f"[FAIL] {name}: rows {len(mine)} != {len(ref)}")
            failures += 1
        elif not mine.equals(ref):
            neq = (mine != ref).any(axis=1)
            print(f"[FAIL] {name}: {neq.sum()} differing rows; first:")
            print(pd.concat([mine[neq].head(3), ref[neq].head(3)]))
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(mine)} rows match ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
