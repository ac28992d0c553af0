"""Whole-surface smoke: every `queries()` entry runs at sf0.001 and
returns a typed, materializable result, and the oracle map stays in
lockstep with the query map. The driver's correctness gate covers the
first 50 entries at sf0.01 and `tools/check_oracles.py` sweeps all of
them value-exactly; this test is the fast regression net for the tail
entries between sweeps."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_oracle_keys_match_query_keys():
    import __ray_entry__ as E
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


@pytest.mark.skipif(not os.environ.get("GRAFT_FULL_SMOKE"),
                    reason="~15 min at the suite's 4 test CPUs — run "
                    "explicitly with GRAFT_FULL_SMOKE=1 (the per-round "
                    "check_oracles sweep covers the same surface "
                    "value-exactly at sf0.01)")
def test_every_query_runs_and_returns_rows():
    import __ray_entry__ as E
    failures = []
    for name, fn in E.queries().items():
        try:
            res = fn(SF)
            if isinstance(res, rd.Dataset):
                n = res.count()
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                assert isinstance(res, pd.DataFrame), type(res)
                n = len(res)
            if n < 0:
                failures.append((name, "negative rows"))
        except Exception as exc:  # noqa: BLE001 — collect, report all
            failures.append((name, f"{type(exc).__name__}: {exc}"))
    assert not failures, failures
