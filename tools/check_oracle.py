#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every ``queries()``
entry against its ``oracle_sql()`` on DuckDB at sf0.01 and compare
row count, column names, and (order-insensitively) values.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float):
        # exact repr: the driver hashes values; we want bit-level agreement
        return repr(v)
    return v


def frame_to_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from pipes_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create or replace view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )

    import time

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failed, passed, skipped = [], [], []
    timings: dict[str, float] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            timings[name] = time.perf_counter() - t0
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if sql is None:
            print(f"SKIP  {name}: no oracle (rows-only check) — rows={len(spdf)}")
            skipped.append(name)
            continue
        try:
            opdf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        s_cols, s_rows = frame_to_rows(spdf)
        o_cols, o_rows = frame_to_rows(opdf)
        if s_cols != o_cols:
            print(f"FAIL  {name}: columns differ spark={s_cols} oracle={o_cols}")
            failed.append(name)
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            failed.append(name)
            continue
        if s_rows != o_rows:
            bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            print(f"FAIL  {name}: {sum(1 for a,b in zip(s_rows,o_rows) if a!=b)} differing rows; first: ")
            for a, b in bad:
                print(f"      spark : {a}\n      oracle: {b}")
            failed.append(name)
            continue
        print(f"PASS  {name} ({len(s_rows)} rows, {timings[name]:.1f}s)")
        passed.append(name)
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    if timings:
        total = sum(timings.values())
        slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        print(f"spark wall time {total:.0f}s across {len(timings)} queries; slowest:")
        for n, t in slow:
            print(f"  {t:6.1f}s  {n}")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
