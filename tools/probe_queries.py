"""Run EVERY ``queries()`` entry against one sf tier and report
per-query status — the executable behind the opt-in
``GRAFT_FULL_SMOKE`` full-surface test.

Usage: ``python tools/probe_queries.py [sf_dir]`` (default
/root/testdata/sf0.001). Owns its own Ray session (``RAY_GRAFT_CPUS``,
default 8 — at 4 CPUs the mixed actor-pool/task stages degrade
pathologically, which is why the pytest hook runs this as a
subprocess instead of inside the suite's 4-CPU session). Prints one
line per query and a final ``FAILURES: [...]`` line; exit code 1 when
any query fails.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as E
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    fails: list[tuple[str, str]] = []
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            res = fn(sf)
            if isinstance(res, rd.Dataset):
                n = res.count()
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                n = len(res)
            status = f"ok n={n}"
            if n < 0:
                raise ValueError("negative row count")
        except Exception as exc:  # noqa: BLE001 — collect, report all
            status = f"FAIL {type(exc).__name__}: {exc}"[:300]
            fails.append((name, status))
        print(f"{name}: {status} ({time.time() - t0:.1f}s)",
              flush=True)
    print(f"FAILURES: {fails}", flush=True)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
