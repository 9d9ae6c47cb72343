#!/usr/bin/env python
"""Round-9 scale probes: measure the three new cost knobs.

1. LPA convergence early exit — a clique forest (the shape near-dup /
   entity-resolution graphs actually have) converges in ~3 rounds; the
   probe measures the same 10-round BUDGET with and without early exit,
   so the saved converged-tail rounds are a number, not a claim.
2. Persisted KN bigram model — score documents against
   warehouse.bigram_model_table vs refitting in-flight (both warm, model
   table pre-built outside the measured region — the ingest contract).
3. Pure-Python Avro throughput — partition-parallel write + 32-split
   read of a 2M-row table: the honest slow-path number for the jar-free
   format.

Usage: python tools/scale_probe_r9.py [lpa] [kn] [avro]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import functions as F

    from pipes_spark.session import get_spark

    which = set(sys.argv[1:]) or {"lpa", "kn", "avro"}
    spark = get_spark("scale_probe_r9")

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.2f}s {out if out is not None else ''}", flush=True)

    if "lpa" in which:
        from pipes_spark.operators.components import label_propagation

        # clique forest: 150k cliques of 8 vertices = 1.2M vertices,
        # 4.2M intra-clique edges; LPA settles every clique to its min id
        # in ~2-3 rounds
        n_cliques = 150_000
        k = 8
        v = spark.range(n_cliques * k).select(
            F.col("id"), (F.col("id") / k).cast("long").alias("cl")
        )
        e = (
            v.alias("a")
            .join(v.alias("b"), F.col("a.cl") == F.col("b.cl"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
            .persist()
        )
        n_edges = e.count()
        print(f"clique forest: {n_edges} edges, {n_cliques * k} vertices")
        # warm one pass so JVM/codegen are out of the measured region
        label_propagation(e, num_iter=1, early_exit=False).count()

        run(
            "lpa_budget10_no_early_exit",
            lambda: label_propagation(e, num_iter=10, early_exit=False).count(),
        )
        stats: dict = {}
        run(
            "lpa_budget10_early_exit",
            lambda: (
                label_propagation(e, num_iter=10, early_exit=True, stats=stats).count(),
                stats,
            ),
        )
        e.unpersist(blocking=True)

    if "avro" in which:
        import shutil

        from pipes_spark.sources.avro import read_avro, write_avro

        d = "/tmp/avro_probe_dir"
        shutil.rmtree(d, ignore_errors=True)
        n = 2_000_000
        src = spark.range(n).select(
            F.col("id"),
            (F.col("id") % 97).alias("k"),
            (F.col("id") * 0.5).alias("v"),
            F.concat(F.lit("row-"), F.col("id")).alias("s"),
        ).repartition(32)
        t0 = time.perf_counter()
        write_avro(src, d)
        t_w = time.perf_counter() - t0
        sz = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )
        df = read_avro(spark, d, split_target_bytes=1 << 21)
        t0 = time.perf_counter()
        got = df.agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")).collect()[0]
        t_r = time.perf_counter() - t0
        assert got["n"] == n, got
        print(
            f"avro_probe: {n} rows, {sz/1e6:.1f} MB deflate, "
            f"write {t_w:.2f}s ({n/t_w/1e6:.2f} Mrows/s), "
            f"read+agg {t_r:.2f}s ({n/t_r/1e6:.2f} Mrows/s, "
            f"{df.rdd.getNumPartitions()} splits)",
            flush=True,
        )
        shutil.rmtree(d, ignore_errors=True)

    if "kn" in which:
        from pipes_spark.operators.text import (
            kneser_ney_perplexity,
            kneser_ney_perplexity_from_model,
        )
        from pipes_spark.sources import load_table
        from pipes_spark.warehouse import bigram_model_table

        docs = load_table(spark, SF_DIR, "documents")
        counts = bigram_model_table(spark, SF_DIR)  # ingest, outside region
        counts.count()

        def _noop(df):
            df.write.mode("overwrite").format("noop").save()

        # warm both paths once, then measure
        _noop(kneser_ney_perplexity(docs))
        _noop(kneser_ney_perplexity_from_model(docs, counts))
        run("kn_inflight_refit", lambda: _noop(kneser_ney_perplexity(docs)))
        run(
            "kn_from_persisted_model",
            lambda: _noop(kneser_ney_perplexity_from_model(docs, counts)),
        )


if __name__ == "__main__":
    main()
