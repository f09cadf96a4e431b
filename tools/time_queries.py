#!/usr/bin/env python
"""Per-query wall-time profile of the full queries() surface at a given sf.

Usage: python tools/time_queries.py [sf_dir] [query ...]

Prints one `name<TAB>seconds<TAB>rows` line per query (sorted by cost at the
end) so the expensive-at-oracle-scale offenders are visible — the driver's
correctness gate at sf0.01 has a budget, and any query over ~3 s eats it.
"""
from __future__ import annotations

import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    timings = []
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            out = fn(sf_dir)
            df = out.to_pandas() if isinstance(out, ray.data.Dataset) else out
            if hasattr(df, "to_pandas"):
                df = df.to_pandas()
            n = len(df)
            err = ""
        except Exception as exc:  # noqa: BLE001
            n, err = -1, repr(exc)[:120]
        dt = time.perf_counter() - t0
        timings.append((dt, name, n, err))
        print(f"{name}\t{dt:.2f}\t{n}\t{err}", flush=True)
    print("\n--- sorted by cost ---")
    for dt, name, n, err in sorted(timings, reverse=True):
        print(f"{dt:7.2f}  {name}  rows={n} {err}")
    total = sum(t[0] for t in timings)
    print(f"TOTAL {total:.1f}s over {len(timings)} queries")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
