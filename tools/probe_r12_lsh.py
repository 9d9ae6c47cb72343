#!/usr/bin/env python
"""Round-12 follow-up probe: dedup_lsh_verified persist-vs-no-persist on
the candidate-pair subtree, interleaved MINs (guide §1; CLAUDE.md
persist-decision rule). The no-persist variant below is a pinned replica
of operators/dedup.lsh_verified_pairs at commit 4754b47 minus the
`scoped_persist(cand)` line — do NOT rerun as a baseline after further
operator edits without re-pinning."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    from pyspark.sql import functions as F

    from pipes_spark.caching import scoped_persist
    from pipes_spark.catalog import _t
    from pipes_spark.operators.dedup import (
        _lsh_candidate_pairs,
        lsh_verified_pairs,
        word_shingles,
    )
    from pipes_spark.operators.scale import ensure_min_partitions
    from pipes_spark.session import get_spark
    from pipes_spark.warehouse import minhash_signature_table

    spark = get_spark("probe_r12_lsh")
    spark.range(1000).selectExpr("sum(id)").collect()
    _w = F.pandas_udf(lambda v: v, "long")
    spark.range(100).select(_w("id")).write.mode("overwrite").format("noop").save()

    d = _t(spark, SF_DIR, "documents")
    sigs = minhash_signature_table(spark, SF_DIR)

    def variant(persist_cand: bool):
        _sigs, cand = _lsh_candidate_pairs(d, "doc_id", "text", 64, 16, 3, 1000, sigs)
        if persist_cand:
            cand = scoped_persist(cand)
        ids = (
            cand.select(F.col("id_a").alias("id"))
            .unionByName(cand.select(F.col("id_b").alias("id")))
            .distinct()
        )
        arrs = scoped_persist(
            ensure_min_partitions(d.join(ids, d["doc_id"] == ids["id"], "left_semi"))
            .select(
                F.col("doc_id").alias("_vid"),
                F.explode(word_shingles("text", 3)).alias("shingle"),
            )
            .select("_vid", F.xxhash64("shingle").alias("sh"))
            .groupBy("_vid")
            .agg(F.collect_list("sh").alias("_hs"), F.count(F.lit(1)).alias("n_sh"))
        )
        return (
            cand.join(
                arrs.select(
                    F.col("_vid").alias("id_a"),
                    F.col("_hs").alias("_hs_a"),
                    F.col("n_sh").alias("n_a"),
                ),
                "id_a",
            )
            .join(
                arrs.select(
                    F.col("_vid").alias("id_b"),
                    F.col("_hs").alias("_hs_b"),
                    F.col("n_sh").alias("n_b"),
                ),
                "id_b",
            )
            .withColumn("n_common", F.size(F.array_intersect("_hs_a", "_hs_b")))
            .filter(F.col("n_common") >= F.lit(1))
            .withColumn(
                "jaccard",
                F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
            )
            .filter(F.col("jaccard") >= 0.2)
            .select("id_a", "id_b", "jaccard")
        )

    runs = {"persist": [], "nopersist": [], "declared": []}
    for i in range(5):
        for name, build in (
            ("persist", lambda: variant(True)),
            ("nopersist", lambda: variant(False)),
            ("declared", lambda: lsh_verified_pairs(d, threshold=0.2, sigs=sigs)),
        ):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            noop(build())
            runs[name].append(time.perf_counter() - t0)
    for name, ts in runs.items():
        print(f"  {name}: min {min(ts):.3f}  all {[round(t,3) for t in ts]}")

    # value identity of the two variants
    a = variant(True).orderBy("id_a", "id_b").collect()
    b = variant(False).orderBy("id_a", "id_b").collect()
    print("  value-identical:", a == b, f"({len(a)} rows)")


if __name__ == "__main__":
    main()
