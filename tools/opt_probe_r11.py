#!/usr/bin/env python
"""Round-11 optimization probes (guide §1: measure first).

Probe A — range-sort child double-execution: a global ``orderBy`` plans an
Exchange rangepartitioning whose RangePartitioner SAMPLES the child RDD with
a separate job before the shuffle-map job runs, so an un-cached expensive
child (e.g. a Python codec chain) is executed twice.  Quantify by timing a
codec query (a) as declared, (b) without the final orderBy, (c) with the
pre-sort result persisted, (d) sorting the cheap input *before* the Python
stages.

Usage: python tools/opt_probe_r11.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timeit(label, fn, reps):
    # warm once, then MIN over reps (the bench's steal-robust estimator)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:55s} min={min(ts):6.3f}s  all={[round(t,3) for t in ts]}")
    return min(ts)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from pipes_spark.caching import scoped_persist
    from pipes_spark.catalog import QUERIES, _t
    from pipes_spark.operators.multimodal import encode_png_assets, png_decode_stats
    from pipes_spark.operators.scale import ensure_min_partitions
    from pipes_spark.session import get_spark

    spark = get_spark("opt_probe_r11")
    # warm JVM / python workers
    spark.range(1000).selectExpr("sum(id)").collect()
    from pipes_spark.sources import load_table

    noop(load_table(spark, SF_DIR, "documents").limit(100))
    import pandas as pd

    noop(
        spark.range(10_000)
        .repartition(32)
        .mapInPandas(lambda it: it, "id long")
    )

    def build_chain():
        d = _t(spark, SF_DIR, "documents").select(
            "doc_id",
            (F.col("doc_id") % 31 + 1).cast("int").alias("width"),
            ((F.col("doc_id") * 7) % 17 + 1).cast("int").alias("height"),
        )
        assets = encode_png_assets(ensure_min_partitions(d), "doc_id", "width", "height")
        return png_decode_stats(assets)

    print(f"--- png_roundtrip variants (sf_dir={SF_DIR}, reps={reps}) ---")
    timeit("declared (decode -> orderBy)", lambda: noop(build_chain().orderBy("asset_id")), reps)
    timeit("no final orderBy", lambda: noop(build_chain()), reps)

    def persisted():
        df = scoped_persist(build_chain())
        noop(df.orderBy("asset_id"))
        df.unpersist()

    timeit("persist pre-sort result, then orderBy", persisted, reps)

    def sort_first():
        d = _t(spark, SF_DIR, "documents").select(
            "doc_id",
            (F.col("doc_id") % 31 + 1).cast("int").alias("width"),
            ((F.col("doc_id") * 7) % 17 + 1).cast("int").alias("height"),
        )
        assets = encode_png_assets(
            ensure_min_partitions(d).sortWithinPartitions("doc_id"), "doc_id", "width", "height"
        )
        noop(png_decode_stats(assets))

    timeit("input sorted, no final sort (shape probe)", sort_first, reps)

    # how much of the floor is the noop write + job overhead itself?
    tiny = spark.range(10)
    timeit("floor: noop of spark.range(10)", lambda: noop(tiny), reps)
    one = _t(spark, SF_DIR, "documents").select("doc_id")
    timeit("floor: noop of documents scan", lambda: noop(one), reps)
    timeit(
        "floor: documents scan -> orderBy",
        lambda: noop(_t(spark, SF_DIR, "documents").select("doc_id").orderBy("doc_id")),
        reps,
    )

    print("--- declared-query spot checks ---")
    for name in ("sketch_theta_diff", "dedup_prefix_doubling"):
        timeit(name, lambda n=name: noop(QUERIES[n].fn(spark, SF_DIR)), reps)


if __name__ == "__main__":
    main()
