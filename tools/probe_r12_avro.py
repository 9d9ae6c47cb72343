#!/usr/bin/env python
"""Round-12 avro decomposition: where do the ~0.4 s of read-only time go?
Construction (Python DataSource lookup + plan/partitions worker + schema
resolution) vs execution (task launch + per-row Python decode + arrow
transfer). Guide §1 — measure before changing."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pipes_spark.session import get_spark
    from pipes_spark.sources.avro import read_avro
    from pipes_spark.warehouse import avro_customer_fixture

    spark = get_spark("probe_r12_avro")
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    _w = F.pandas_udf(lambda v: v, "long")
    spark.range(100).select(_w("id")).write.mode("overwrite").format("noop").save()

    path = avro_customer_fixture(spark, SF_DIR)
    print("file size:", os.path.getsize(path))

    for label, fn in (
        ("construct only (load())", lambda: read_avro(spark, path, split_target_bytes=1 << 16)),
        (
            "construct+schema (df.schema)",
            lambda: read_avro(spark, path, split_target_bytes=1 << 16).schema,
        ),
    ):
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"  {label}: min {best:.3f}")

    # construct once, execute many — isolates execution
    df = read_avro(spark, path, split_target_bytes=1 << 16)
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  execute only (reused df): min {best:.3f}")

    # fresh construct + execute (what the bench pays)
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        read_avro(spark, path, split_target_bytes=1 << 16).write.mode(
            "overwrite"
        ).format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  construct+execute: min {best:.3f}")


if __name__ == "__main__":
    main()
