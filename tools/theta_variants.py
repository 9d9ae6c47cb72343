"""PINNED BASELINE — r11 session. The *_old / variant bodies below are
inline replicas FROZEN at the shapes the r11 optimization session
started from; operators/ has moved on (r11 changes, then r12). Do NOT rerun these as
baselines after further operator edits without re-pinning.

kmv_a_not_b persist-strategy variants for the optimization-round A/B
(tools/probe use only; the operator itself lives in operators/rollup.py)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipes_spark.operators.rollup import _KMV_SPACE, kmv_hash56
from pipes_spark.sources import load_table


def build(spark, SF, persist_dk, persist_dh, persist_per):
    from pipes_spark.caching import scoped_persist

    o = load_table(spark, SF, "orders")
    df = o.filter(F.year("o_orderdate").isin(1995, 1996)).select(
        F.concat(F.lit("y"), F.year("o_orderdate").cast("string")).alias("yr"),
        "o_custkey",
    )
    set_col, key_col, k, buckets = "yr", "o_custkey", 64, 64
    dk = df.select(
        F.col(set_col).cast("string").alias("_s"),
        F.col(key_col).cast("string").alias("_k"),
        kmv_hash56(F.col(key_col)).alias("_h"),
    ).distinct()
    if persist_dk:
        dk = scoped_persist(dk)
    dh = dk.select("_s", "_h").distinct()
    if persist_dh:
        dh = scoped_persist(dh)
    w_bucket = Window.partitionBy("_s", F.pmod(F.col("_h"), F.lit(buckets))).orderBy("_h")
    surv = dh.withColumn("_rb", F.row_number().over(w_bucket)).filter(F.col("_rb") <= k).drop("_rb")
    theta = (
        surv.groupBy("_s")
        .agg(F.sort_array(F.collect_list("_h")).alias("_hs"))
        .select(
            F.when(F.size("_hs") >= k, F.element_at("_hs", F.lit(k)))
            .otherwise(F.lit(_KMV_SPACE))
            .alias("_th_s")
        )
        .agg(F.min("_th_s").cast("bigint").alias("_theta"))
    )
    names = dh.agg(
        F.min("_s").alias("_s_lo"),
        F.max("_s").alias("_s_hi"),
        F.count_distinct("_s").alias("_nsets"),
    )
    below = dh.join(F.broadcast(theta)).filter(F.col("_h") < F.col("_theta"))
    only = (
        below.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_ns"), F.min("_s").alias("_owner"))
        .filter(F.col("_ns") == 1)
    )
    sk_counts = only.groupBy(F.col("_owner").alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_sk")
    )
    exact = (
        dk.groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_ns"), F.min("_s").alias("_owner"))
        .filter(F.col("_ns") == 1)
        .groupBy(F.col("_owner").alias("_s"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    sets = dh.select("_s").distinct()
    per = (
        sets.join(exact, "_s", "left")
        .join(sk_counts, "_s", "left")
        .join(F.broadcast(theta.select(F.col("_theta").alias("_th"))))
        .join(F.broadcast(names))
        .select(
            F.concat(
                F.col("_s"),
                F.lit("_not_"),
                F.when(F.col("_s") == F.col("_s_lo"), F.col("_s_hi")).otherwise(F.col("_s_lo")),
            ).alias("set_name"),
            (
                F.coalesce(F.col("n_exact"), F.lit(0).cast("bigint"))
                * F.when(F.col("_nsets") == 2, F.lit(1)).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit("kmv_a_not_b expects exactly 2 sets, got "),
                            F.col("_nsets").cast("string"),
                        )
                    )
                )
            )
            .cast("bigint")
            .alias("n_exact"),
            F.round(
                F.coalesce(F.col("_n_sk"), F.lit(0).cast("bigint")).cast("double")
                * F.lit(float(_KMV_SPACE))
                / F.col("_th").cast("double"),
                6,
            ).alias("est"),
        )
    )
    if persist_per:
        per = scoped_persist(per)
    sym = per.agg(
        F.lit("sym_diff").alias("set_name"),
        F.sum("n_exact").cast("bigint").alias("n_exact"),
        F.round(F.sum("est"), 6).alias("est"),
    )
    return per.unionByName(sym).orderBy("set_name")
