#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry AND its ``oracle_sql()`` DuckDB counterpart
over the same sf dir, then compares row count, schema (sorted column
names), and a value hash (columns sorted by name, rows sorted) — the same
order-insensitive comparison the driver performs. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys


def _normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def value_hash(df) -> str:
    df = _normalize(df)
    blob = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo must not silently skip everything and "pass"
        print(f"unknown queries: {sorted(unknown)}")
        print(json.dumps({"failures": len(unknown)}))
        return 1
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            out = fn(sf_dir)
            df = out.to_pandas() if isinstance(out, ray.data.Dataset) else out
            if hasattr(df, "to_pandas"):  # pyarrow.Table
                df = df.to_pandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: RAY ERROR {exc!r}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(df)})")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {exc!r}")
            failures += 1
            continue
        rows = len(df) == len(odf)
        schema = sorted(df.columns) == sorted(odf.columns)
        # only compare hashes once rows+schema agree — else report skipped,
        # not False (a row-count problem is not a value divergence)
        hash_ok = value_hash(df) == value_hash(odf) if (schema and rows) else None
        status = "OK" if hash_ok else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(df)}/{len(odf)} schema={schema} "
            f"hash={'skipped' if hash_ok is None else hash_ok}"
        )
    ray.shutdown()
    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
