#!/usr/bin/env python
"""Round-12 measurement probe (guide §1): decompose the cost of the
remaining expensive paths BEFORE changing them.

Usage: python tools/probe_r12.py [streaming|kn|ahash|avro|all]

Each section prints wall-clock numbers for isolated sub-pieces with the
noop sink, so the expensive stage is identified empirically rather than
guessed. One Spark process at a time (CLAUDE.md) — run alone.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label}: min {best:.3f}s over {n}")
    return best


def probe_streaming(spark):
    """Batch counts + durationMs decomposition for the two benched
    streaming queries."""
    from pipes_spark.catalog import QUERIES
    from pipes_spark.streaming import run_to_memory
    import pipes_spark.streaming as st

    print("== streaming ==")
    # run each query once, then read the LAST StreamingQuery's progress
    for name in ("streaming_events_hourly", "streaming_stateful_totals"):
        for i in range(3):
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, SF_DIR)
            noop(df)
            dt = time.perf_counter() - t0
            # the finished query is gone from spark.streams; progress was
            # recorded during run via _await_and_record — instead re-run
            # manually below for progress detail
            print(f"  {name} pass {i}: {dt:.3f}s")
    # manual run with progress capture: stateful totals
    from pipes_spark.catalog import _events_stream  # type: ignore
    from pipes_spark.streaming import stateful_running_totals

    stream = _events_stream(spark, SF_DIR)
    totals = stateful_running_totals(stream, "user_id", "value")
    import uuid

    nm = f"probe_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        totals.writeStream.format("memory")
        .queryName(nm)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    t_start = time.perf_counter() - t0
    q.awaitTermination()
    t_total = time.perf_counter() - t0
    import json

    print(f"  stateful: start() {t_start:.3f}s, total {t_total:.3f}s")
    for p in q.recentProgress:
        d = p["durationMs"] if isinstance(p, dict) else None
        if d is None:
            continue
        print(
            "   batch", p.get("batchId"), "numInputRows", p.get("numInputRows"),
            "durationMs", json.dumps(d),
        )
    spark.catalog.dropTempView(nm)


def probe_kn(spark):
    print("== text_kn_perplexity_indexed ==")
    from pipes_spark.catalog import QUERIES, _t
    from pipes_spark.operators.text import (
        _bigram_stream,
        _perplexity_agg,
        kneser_ney_lp_table,
    )
    from pipes_spark.warehouse import bigram_model_table

    counts = bigram_model_table(spark, SF_DIR)
    d = _t(spark, SF_DIR, "documents")

    timed("full query (declared)", lambda: noop(QUERIES["text_kn_perplexity_indexed"].fn(spark, SF_DIR)))

    def c2_only():
        noop(counts.groupBy("w1", "w2").agg((__import__("pyspark.sql.functions", fromlist=["sum"]).sum("c2")).alias("_c2")))

    timed("c2 read+compact only", c2_only)

    def lp_only():
        from pyspark.sql import functions as F

        c2 = counts.groupBy("w1", "w2").agg(F.sum("c2").alias("_c2"))
        noop(kneser_ney_lp_table(c2))

    timed("lp_table (no persist)", lp_only)

    def scored_nosort():
        from pyspark.sql import functions as F

        c2 = counts.groupBy("w1", "w2").agg(F.sum("c2").alias("_c2"))
        lp = kneser_ney_lp_table(c2)
        _, big = _bigram_stream(d, "text", "doc_id")
        sc = big.join(lp, ["w1", "w2"]).select(F.col("doc_id"), "_lp")
        noop(_perplexity_agg(sc, "doc_id", "kn_perplexity"))

    timed("score, no persist no sort", scored_nosort)

    def tokenize_only():
        _, big = _bigram_stream(d, "text", "doc_id")
        noop(big)

    timed("bigram stream only", tokenize_only)


def probe_ahash(spark):
    print("== multimodal_cross_codec_ahash ==")
    from pyspark.sql import functions as F

    from pipes_spark.catalog import QUERIES, _doc_rows, _t
    from pipes_spark.operators.multimodal import encode_image_assets, image_ahash
    from pipes_spark.operators.scale import presorted_min_partitions

    timed("full query (declared)", lambda: noop(QUERIES["multimodal_cross_codec_ahash"].fn(spark, SF_DIR)))

    def base(codec_expr):
        d = _t(spark, SF_DIR, "documents").select(
            "doc_id",
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            codec_expr.alias("codec"),
        )
        return presorted_min_partitions(d, "doc_id", rows=_doc_rows(SF_DIR))

    mixed = F.element_at(
        F.array(F.lit("png"), F.lit("gif"), F.lit("jpeg")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    timed("encode only (mixed)", lambda: noop(encode_image_assets(base(mixed), "doc_id", "width", "height", "codec")))
    timed("encode+ahash (mixed)", lambda: noop(image_ahash(encode_image_assets(base(mixed), "doc_id", "width", "height", "codec"))))
    for fam in ("png", "gif", "jpeg"):
        timed(
            f"encode+ahash ({fam} only)",
            lambda fam=fam: noop(
                image_ahash(encode_image_assets(base(F.lit(fam)), "doc_id", "width", "height", "codec"))
            ),
            n=2,
        )


def probe_avro(spark):
    print("== avro ==")
    from pyspark.sql import functions as F

    from pipes_spark.catalog import QUERIES
    from pipes_spark.sources.avro import read_avro
    from pipes_spark.warehouse import avro_customer_fixture

    for nm in ("source_avro_roundtrip", "source_avro_snappy_roundtrip", "source_avro_evolution"):
        timed(f"full {nm}", lambda nm=nm: noop(QUERIES[nm].fn(spark, SF_DIR)))

    path = avro_customer_fixture(spark, SF_DIR)
    timed("read only (64KiB splits)", lambda: noop(read_avro(spark, path, split_target_bytes=1 << 16)))
    timed("read only (1MiB splits)", lambda: noop(read_avro(spark, path, split_target_bytes=1 << 20)))

    def agg_nosort():
        df = read_avro(spark, path, split_target_bytes=1 << 16)
        noop(
            df.groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2).alias("total_acctbal"),
            )
        )

    timed("agg, no orderBy", agg_nosort)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from pipes_spark.session import get_spark

    spark = get_spark("probe_r12")
    # mirror bench warm-up for comparability of absolute numbers
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    _w = F.pandas_udf(lambda v: v, "long")
    spark.range(100).select(_w("id")).write.mode("overwrite").format("noop").save()
    if which in ("streaming", "all"):
        import tempfile

        from pipes_spark.streaming import run_to_memory

        wdir = tempfile.mkdtemp(prefix="probe_warm_stream_")
        spark.range(100).selectExpr(
            "id", "timestamp_micros(cast(id * 1000000 as long)) AS ts"
        ).write.mode("overwrite").parquet(wdir)
        ws = spark.readStream.schema("id long, ts timestamp").parquet(wdir)
        run_to_memory(ws.groupBy("id").count(), output_mode="complete").count()
        probe_streaming(spark)
    if which in ("kn", "all"):
        probe_kn(spark)
    if which in ("ahash", "all"):
        probe_ahash(spark)
    if which in ("avro", "all"):
        probe_avro(spark)


if __name__ == "__main__":
    main()
