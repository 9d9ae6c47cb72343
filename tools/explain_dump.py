#!/usr/bin/env python
"""Dump ``explain("formatted")`` for declared queries to files.

Usage: python tools/explain_dump.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from pipes_spark.catalog import QUERIES
    from pipes_spark.session import get_spark

    spark = get_spark("explain_dump")
    # full metadata in plan strings (CLAUDE.md: default truncations break
    # text audits)
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({suffix}) explain(formatted), sf_dir={SF_DIR} ==\n")
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
