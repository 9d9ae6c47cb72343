#!/usr/bin/env python
"""Session probe (optimization round 1, resumed session): decompose the two
top remaining headline queries — q1_pricing_summary and dedup_lsh_verified —
per guide §1 (measure first, noop sink, warm MINs)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pipes_spark.session import get_spark
from pipes_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timeit(label, fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:55s} min={min(ts):6.3f} all={[round(t,3) for t in ts]}", flush=True)
    return min(ts)


def main():
    spark = get_spark("probe_r11b")
    spark.range(1000).selectExpr("sum(id)").collect()
    noop(load_table(spark, SF, "lineitem").limit(1000))

    li = load_table(spark, SF, "lineitem")
    print("== q1 decomposition ==", flush=True)
    cols7 = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    ]
    timeit("scan 7 cols only (noop)", lambda: noop(li.select(*cols7)))

    from pipes_spark.catalog import QUERIES

    timeit("q1 declared", lambda: noop(QUERIES["q1_pricing_summary"].fn(spark, SF)))

    def q1_variant(repart):
        d = li.select(*cols7).filter(
            F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
        )
        if repart:
            from pipes_spark.operators.scale import ensure_min_partitions

            d = ensure_min_partitions(d)
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return d.groupBy("l_returnflag", "l_linestatus").agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(disc.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
            F.sum((disc * (1 + F.col("l_tax"))).cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )

    timeit("q1 shape, no repart", lambda: noop(q1_variant(False)))
    timeit("q1 shape, ensure_min_partitions", lambda: noop(q1_variant(True)))

    # value-identity check: single-task vs repartitioned, after rounding
    a = sorted(q1_variant(False).collect(), key=lambda r: (r[0], r[1]))
    b = sorted(q1_variant(True).collect(), key=lambda r: (r[0], r[1]))
    print("q1 repart rows identical:", a == b, flush=True)

    print("== dedup_lsh_verified decomposition ==", flush=True)
    from pipes_spark import caching
    from pipes_spark.operators.dedup import _lsh_candidate_pairs, lsh_verified_pairs
    from pipes_spark.warehouse import minhash_signature_table

    d = load_table(spark, SF, "documents")
    sigs = minhash_signature_table(spark, SF)

    def fresh(fn):
        # mimic the bench: caches cleared, scope per query
        spark.catalog.clearCache()
        caching.begin_scope("probe")
        fn()

    timeit("declared full", lambda: fresh(lambda: noop(lsh_verified_pairs(d, threshold=0.2, sigs=sigs))))
    timeit("candidates only", lambda: fresh(lambda: noop(_lsh_candidate_pairs(d, "doc_id", "text", 64, 16, 3, 1000, sigs)[1])))

    # candidate pair / doc counts (sizing for the verify stage)
    _, cand = _lsh_candidate_pairs(d, "doc_id", "text", 64, 16, 3, 1000, sigs)
    n_pairs = cand.count()
    n_docs = cand.select(F.col("id_a").alias("id")).unionByName(cand.select(F.col("id_b").alias("id"))).distinct().count()
    print(f"candidate pairs={n_pairs} candidate docs={n_docs}", flush=True)


if __name__ == "__main__":
    main()
