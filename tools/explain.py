"""Print Ray Data execution stats for one registry query — the tuning
feedback loop: which operator dominates wall time, how many blocks
each stage moved, where the exchanges are.

Usage: python tools/explain.py <query_name> [sf_dir]
       (sf_dir defaults to /root/testdata/sf0.01)

Materializes the query's Dataset (driver-side results just print
their shape) and dumps `ds.stats()` plus a one-line wall-clock
summary. Owns its Ray session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entry

    qs = entry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; known: {sorted(qs)[:10]}...")
        return 2
    t0 = time.monotonic()
    res = qs[name](sf_dir)
    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        wall = time.monotonic() - t0
        print(res.stats())
        n = res.count()
    else:
        wall = time.monotonic() - t0
        n = len(res)
        print(f"(driver-side result: {type(res).__name__}, "
              f"no Dataset stats)")
    print(f"\n[explain] {name} over {sf_dir}: {n} rows "
          f"in {wall:.2f} s")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
