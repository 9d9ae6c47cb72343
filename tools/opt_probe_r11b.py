#!/usr/bin/env python
"""Optimization round-2 probe (guide §1: measure first).

For each target query: time CONSTRUCTION (the catalog fn call) separately
from the ACTION (noop write), and count Spark jobs fired during
construction (statusTracker job ids) — construct-time jobs are the
documented small-side collects; this probe quantifies what replacing them
with driver-side pyarrow reads would save.

Usage: python tools/opt_probe_r11b.py [reps] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "sim_ivf_topk",
    "sim_ivf_indexed",
    "sim_ivfpq_indexed",
    "sim_quantized_topk",
    "sim_lsh_topk",
    "sim_cosine_topk",
    "sim_cosine_neardup",
    "dedup_lsh_verified",
    "dedup_minhash_lsh",
    "text_kn_perplexity_indexed",
    "sketch_theta_diff",
    "dedup_prefix_doubling",
    "multimodal_cross_codec_ahash",
    "q21_waiting_supplier",
    "q1_pricing_summary",
    "window_frames",
    "text_tfidf",
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or DEFAULT

    from pipes_spark.catalog import QUERIES
    from pipes_spark.session import get_spark
    from pipes_spark.sources import load_table

    spark = get_spark("opt_probe_r11b")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    load_table(spark, SF_DIR, "lineitem").limit(1000).write.mode("overwrite").format(
        "noop"
    ).save()
    from pyspark.sql import functions as F

    _w = F.pandas_udf(lambda v: v, "long")
    spark.range(100).select(_w("id")).write.mode("overwrite").format("noop").save()

    # pre-build ingest artifacts exactly like bench.py
    from pipes_spark.warehouse import (
        bigram_model_table,
        ivf_index_tables,
        ivfpq_index_tables,
        minhash_signature_table,
        quantized_embeddings_table,
        warm_bucketed_facts,
    )

    warm_bucketed_facts(spark, SF_DIR)
    quantized_embeddings_table(spark, SF_DIR)
    ivf_index_tables(spark, SF_DIR)
    ivfpq_index_tables(spark, SF_DIR)
    minhash_signature_table(spark, SF_DIR)
    bigram_model_table(spark, SF_DIR)

    def job_count():
        try:
            return len(sc.statusTracker().getJobIdsForGroup(None))
        except Exception:
            return -1

    print(f"{'query':35s} {'con_min':>8s} {'act_min':>8s} {'jobs@con':>8s}")
    for name in names:
        if name not in QUERIES:
            print(f"{name:35s} MISSING")
            continue
        cons, acts, jobs = [], [], []
        for _ in range(reps):
            spark.catalog.clearCache()
            j0 = job_count()
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            j1 = job_count()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            acts.append(t2 - t1)
            jobs.append(j1 - j0)
        print(
            f"{name:35s} {min(cons):8.3f} {min(acts):8.3f} {max(jobs):8d}"
            f"   con_all={[round(x,3) for x in cons]} act_all={[round(x,3) for x in acts]}"
        )


if __name__ == "__main__":
    main()
