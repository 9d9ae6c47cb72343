#!/usr/bin/env python
"""PINNED BASELINE — r11 session. The *_old / variant bodies below are
inline replicas FROZEN at the shapes the r11 optimization session
started from; operators/ has moved on (r11 changes, then r12). Do NOT rerun these as
baselines after further operator edits without re-pinning.

A/B + plan capture for this session's two changes:
- q1_pricing_summary: ensure_min_partitions before the decimal partial agg
- dedup_lsh_verified: pair-array verify (array_intersect) replacing the
  shingle-level re-join
Old shapes are inline replicas of the pre-change code; plans go to
plans/r11/ in the established format."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout

from pyspark.sql import functions as F

from pipes_spark import caching
from pipes_spark.catalog import QUERIES
from pipes_spark.session import get_spark
from pipes_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def q1_old(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
            F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def lsh_old(spark, sf_dir):
    from pipes_spark.operators.dedup import _lsh_candidate_pairs
    from pipes_spark.caching import scoped_persist
    from pipes_spark.warehouse import minhash_signature_table

    df = load_table(spark, sf_dir, "documents")
    sigs = minhash_signature_table(spark, sf_dir)
    id_col, text_col, threshold = "doc_id", "text", 0.2
    from pipes_spark.operators.dedup import word_shingles

    _sigs, cand = _lsh_candidate_pairs(df, id_col, text_col, 64, 16, 3, 1000, sigs)
    ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = scoped_persist(
        df.join(ids, df[id_col] == ids["id"], "left_semi")
        .select(
            F.col(id_col).alias("_vid"),
            F.explode(word_shingles(text_col, 3)).alias("shingle"),
        )
        .select("_vid", F.xxhash64("shingle").alias("sh"))
    )
    sizes = sh.groupBy("_vid").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(sh.select(F.col("_vid").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("_vid").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("_vid").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_vid").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def write_plan(df, name, tag):
    path = os.path.join(PLANS, f"{name}_{tag}.txt")
    with open(path, "w") as fh, redirect_stdout(fh):
        print(f"== {name} ({tag.split('_')[-1]}) explain(formatted), sf_dir={SF} ==")
        df.explain("formatted")
    print("wrote", path, flush=True)


def main():
    spark = get_spark("probe_r11b_ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    noop(load_table(spark, SF, "lineitem").limit(1000))

    # interleaved A/B, bench-like (clearCache + fresh scope per invocation)
    variants = {
        "q1 OLD": lambda: q1_old(spark, SF),
        "q1 NEW": lambda: QUERIES["q1_pricing_summary"].fn(spark, SF),
        "lsh OLD": lambda: lsh_old(spark, SF),
        "lsh NEW": lambda: QUERIES["dedup_lsh_verified"].fn(spark, SF),
    }
    times = {k: [] for k in variants}
    for _ in range(7):
        for k, fn in variants.items():
            spark.catalog.clearCache()
            caching.begin_scope("ab")
            t0 = time.perf_counter()
            noop(fn())
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:10s} min={min(ts):6.3f} all={[round(t,3) for t in ts]}", flush=True)

    # value identity old vs new for lsh at sf0.1
    spark.catalog.clearCache(); caching.begin_scope("ab")
    old_rows = sorted(map(tuple, lsh_old(spark, SF).collect()))
    spark.catalog.clearCache(); caching.begin_scope("ab")
    new_rows = sorted(map(tuple, QUERIES["dedup_lsh_verified"].fn(spark, SF).collect()))
    print("lsh rows identical:", old_rows == new_rows, len(new_rows), flush=True)

    # plans
    write_plan(q1_old(spark, SF), "q1_pricing_summary", "before")
    write_plan(QUERIES["q1_pricing_summary"].fn(spark, SF), "q1_pricing_summary", "after")
    write_plan(lsh_old(spark, SF), "dedup_lsh_verified_arrayverify", "before")
    write_plan(QUERIES["dedup_lsh_verified"].fn(spark, SF), "dedup_lsh_verified_arrayverify", "after")


if __name__ == "__main__":
    main()
