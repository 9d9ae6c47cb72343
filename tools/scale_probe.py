#!/usr/bin/env python
"""Scaling probe: run selected operators at sf0.1 and on a synthetic 10×
corpus (id-offset replicas with perturbations — same construction as the
COVERAGE.md measured-scaling table) and print per-operator timings.

Usage: python tools/scale_probe.py [op ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(docs, copies: int):
    """id-offset replicas; every copy beyond the first perturbs the text
    tail so replicas are near-dups, not exact dups."""
    n = 10_000_000
    parts = [docs]
    for c in range(1, copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + c * n).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" variant {c}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def replicate_embeddings(emb, copies: int):
    n = 10_000_000
    parts = [emb]
    for c in range(1, copies):
        parts.append(
            emb.select(
                (F.col("vec_id") + c * n).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(float(c)) * F.lit(1e-3)
                ).alias("embedding"),
                "label",
            )
        )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def main() -> None:
    from pipes_spark.operators.components import connected_components
    from pipes_spark.operators.dedup import minhash_lsh_pairs
    from pipes_spark.operators.similarity import quantize_int8, quantized_cosine_topk
    from pipes_spark.session import get_spark
    from pipes_spark.sources import load_table

    spark = get_spark("scale_probe")
    only = set(sys.argv[1:])

    docs1 = load_table(spark, SF_DIR, "documents")
    docs10 = replicate_docs(docs1, 10).localCheckpoint()
    emb1 = load_table(spark, SF_DIR, "embeddings")
    emb10 = replicate_embeddings(emb1, 10).localCheckpoint()
    q1 = emb1.filter(F.col("vec_id") < 20)

    def run(name, fn):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        n = fn()
        print(f"{name}: {time.perf_counter() - t0:.2f}s ({n} rows)", flush=True)

    run("cc_1x", lambda: connected_components(minhash_lsh_pairs(docs1)).count())
    run("cc_10x", lambda: connected_components(minhash_lsh_pairs(docs10)).count())
    run(
        "quantized_topk_1x",
        lambda: quantized_cosine_topk(
            emb1, q1, k=5, quantized_corpus=quantize_int8(emb1)
        ).count(),
    )
    run(
        "quantized_topk_10x",
        lambda: quantized_cosine_topk(
            emb10, q1, k=5, quantized_corpus=quantize_int8(emb10)
        ).count(),
    )

    # IVF persisted index: build (ingest-time, unmeasured) then query — the
    # probe is whether query latency stays ~flat as the corpus grows 10×,
    # since the partition-pruned scan reads only the probed lists' files.
    def ivf_indexed(emb, tag):
        import tempfile

        from pipes_spark.operators.similarity import (
            assign_ivf_lists,
            fit_ivf_centroids,
            ivf_cosine_topk_indexed,
        )

        C = fit_ivf_centroids(emb, num_centroids=16)
        path = tempfile.mkdtemp(prefix=f"ivf_probe_{tag}_") + "/corpus"
        assign_ivf_lists(emb, C).write.partitionBy("list_id").parquet(path)
        corpus = spark.read.parquet(path)
        cb = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(C)],
            "list_id int, centroid array<double>",
        )
        return lambda: ivf_cosine_topk_indexed(cb, corpus, q1, k=5).count()

    if not only or {"ivf_indexed_1x", "ivf_indexed_10x"} & only:
        probe1 = ivf_indexed(emb1, "1x")
        probe10 = ivf_indexed(emb10, "10x")
        run("ivf_indexed_1x", probe1)
        run("ivf_indexed_10x", probe10)

    from pipes_spark.operators.dedup import benchmark_contamination
    from pipes_spark.operators.packing import pack_greedy
    from pipes_spark.operators.text import repetition_scores, token_count

    run("repetition_1x", lambda: repetition_scores(docs1).count())
    run("repetition_10x", lambda: repetition_scores(docs10).count())

    def contamination(docs):
        bench = docs.filter(F.col("doc_id") % 20 == 0)
        return benchmark_contamination(
            docs.filter(F.col("doc_id") % 20 != 0), bench, shingle_n=5
        ).count()

    run("contamination_1x", lambda: contamination(docs1))
    run("contamination_10x", lambda: contamination(docs10))

    def pack(docs):
        d = docs.select("doc_id", token_count("text").alias("n_tokens"))
        return pack_greedy(d, budget=2048, num_buckets=32).count()

    run("pack_1x", lambda: pack(docs1))
    run("pack_10x", lambda: pack(docs10))

    from pipes_spark.operators.dedup import lsh_verified_pairs

    run("lsh_verified_1x", lambda: lsh_verified_pairs(docs1).count())
    run("lsh_verified_10x", lambda: lsh_verified_pairs(docs10).count())

    # time-series: 10× events = 10× the users (id-offset replicas), the
    # realistic scale-out direction (per-key spans stay constant)
    ev1 = load_table(spark, SF_DIR, "events")
    nn = 10_000_000
    from functools import reduce

    ev10 = reduce(
        lambda a, b: a.unionByName(b),
        [
            ev1.select(
                (F.col("event_id") + c * nn).alias("event_id"),
                "ts",
                (F.col("user_id") + c * nn).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for c in range(10)
        ],
    ).localCheckpoint()

    from pipes_spark.operators.timeseries import forward_fill, funnel, gapfill

    def daily(ev):
        return ev.groupBy("user_id", F.date_trunc("day", "ts").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n")
        )

    run("gapfill_1x", lambda: gapfill(daily(ev1), ["user_id"], "bucket", "1 day", ["n"]).count())
    run("gapfill_10x", lambda: gapfill(daily(ev10), ["user_id"], "bucket", "1 day", ["n"]).count())
    run(
        "ffill_1x",
        lambda: forward_fill(ev1, ["user_id"], ["ts", "event_id"], ["value"]).count(),
    )
    run(
        "ffill_10x",
        lambda: forward_fill(ev10, ["user_id"], ["ts", "event_id"], ["value"]).count(),
    )
    steps = ["view", "click", "purchase"]
    run("funnel_1x", lambda: funnel(ev1, "user_id", "ts", "event_type", steps).count())
    run("funnel_10x", lambda: funnel(ev10, "user_id", "ts", "event_type", steps).count())

    from pipes_spark.operators.relational import sessionize, sessionize_bucketed

    # hot-user probe: ALL events on one user — the single-window sessionize
    # puts the whole table in one task; the bucketed variant spreads it
    hot1 = ev1.withColumn("user_id", F.lit(0))
    hot10 = ev10.withColumn("user_id", F.lit(0)).localCheckpoint()
    run(
        "sessionize_hot_global",
        lambda: sessionize(hot10, "user_id", "ts", 1800, order_tiebreak="event_id").count(),
    )
    run(
        "sessionize_hot_bucketed",
        lambda: sessionize_bucketed(
            hot10, "user_id", "ts", 1800, order_tiebreak="event_id"
        ).count(),
    )
    run(
        "sessionize_bucketed_1x",
        lambda: sessionize_bucketed(ev1, "user_id", "ts", 1800, order_tiebreak="event_id").count(),
    )
    run(
        "sessionize_bucketed_10x",
        lambda: sessionize_bucketed(ev10, "user_id", "ts", 1800, order_tiebreak="event_id").count(),
    )



    # round-2b additions: clustering / SemDeDup / PQ / chunking / rolling stats
    from pipes_spark.operators.clustering import (
        kmeans_fit,
        semantic_dedup_pairs,
    )

    def kmeans(emb):
        return len(kmeans_fit(emb, k=8, iters=3))

    run("kmeans_1x", lambda: kmeans(emb1))
    run("kmeans_10x", lambda: kmeans(emb10))

    def semdedup(emb):
        C = kmeans_fit(emb, k=8, iters=3)
        return semantic_dedup_pairs(emb, C, threshold=0.3).count()

    run("semdedup_1x", lambda: semdedup(emb1))
    run("semdedup_10x", lambda: semdedup(emb10))

    from pipes_spark.operators.similarity import fit_pq_codebooks, pq_adc_topk, pq_encode

    def pq(emb):
        books = fit_pq_codebooks(emb, m=8, num_codes=64, iters=5)
        enc = pq_encode(emb, books).localCheckpoint()  # ingest-time tier
        return pq_adc_topk(emb, q1, books, k=5, encoded_corpus=enc).count()

    run("pq_topk_1x", lambda: pq(emb1))
    run("pq_topk_10x", lambda: pq(emb10))

    from pipes_spark.operators.text import chunk_token_windows

    run("chunk_1x", lambda: chunk_token_windows(docs1, max_tokens=32, stride=24).count())
    run("chunk_10x", lambda: chunk_token_windows(docs10, max_tokens=32, stride=24).count())

    from pipes_spark.operators.timeseries import ewma, zscore_outliers

    run(
        "ewma_1x",
        lambda: ewma(ev1, ["user_id"], ["ts", "event_id"], "value", span=12).count(),
    )
    run(
        "ewma_10x",
        lambda: ewma(ev10, ["user_id"], ["ts", "event_id"], "value", span=12).count(),
    )
    run(
        "zscore_1x",
        lambda: zscore_outliers(ev1, ["event_type"], ["ts", "event_id"], "value").count(),
    )
    run(
        "zscore_10x",
        lambda: zscore_outliers(ev10, ["event_type"], ["ts", "event_id"], "value").count(),
    )

    from pipes_spark.operators.profiling import mad_outliers

    run("mad_1x", lambda: mad_outliers(ev1, ["event_type"], "value").count())
    run("mad_10x", lambda: mad_outliers(ev10, ["event_type"], "value").count())

    from pipes_spark.operators.timeseries import zscore_outliers_bucketed

    run(
        "zscore_bucketed_1x",
        lambda: zscore_outliers_bucketed(ev1, ["event_type"], ["ts", "event_id"], "value").count(),
    )
    run(
        "zscore_bucketed_10x",
        lambda: zscore_outliers_bucketed(ev10, ["event_type"], ["ts", "event_id"], "value").count(),
    )

    from pipes_spark.operators.dedup import ngram_jaccard_pairs, prefix_jaccard_pairs

    # prefix filtering pays when the prefix (n - ceil(t*n) + 1 tokens) is
    # short, i.e. at HIGH thresholds; at t=0.2 the prefix is ~80% of the
    # doc and the pass is the full join plus rank overhead (measured:
    # 9.5 s vs 3.6 s at 1x, diverging at 10x). Probe the design point.
    run("jaccard_full_t07_10x", lambda: ngram_jaccard_pairs(docs10, threshold=0.7).count())
    run("jaccard_prefix_t07_10x", lambda: prefix_jaccard_pairs(docs10, threshold=0.7).count())

    from pipes_spark.operators.dedup import duplicated_span_pairs

    run("dup_spans_1x", lambda: duplicated_span_pairs(docs1).count())
    run("dup_spans_10x", lambda: duplicated_span_pairs(docs10).count())

    # round-3 additions: triangles / kNN graph / LPA / fuzzy join / paths
    from pipes_spark.operators.components import label_propagation, triangle_count
    from pipes_spark.operators.relational import attribution, path_transitions
    from pipes_spark.operators.similarity import knn_graph
    from pipes_spark.operators.text import fuzzy_join_segments

    li1 = load_table(spark, SF_DIR, "lineitem")
    li10 = reduce(
        lambda a, b: a.unionByName(b),
        [li1] + [
            li1.select(
                (F.col("l_orderkey") + c * 10_000_000).alias("l_orderkey"),
                *[c2 for c2 in li1.columns if c2 != "l_orderkey"],
            )
            for c in range(1, 10)
        ],
    ).localCheckpoint()

    def copurchase(li):
        return (
            li.select("l_orderkey", F.col("l_partkey").alias("a"))
            .join(li.select("l_orderkey", F.col("l_partkey").alias("b")), "l_orderkey")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )

    run("triangles_1x", lambda: triangle_count(copurchase(li1), "a", "b").count())
    run("triangles_10x", lambda: triangle_count(copurchase(li10), "a", "b").count())

    run("knn_graph_1x", lambda: knn_graph(emb1, k=3, floor=0.3).count())
    run("knn_graph_10x", lambda: knn_graph(emb10, k=3, floor=0.3).count())

    from pipes_spark.operators.dedup import lsh_verified_pairs as _lvp

    run(
        "labelprop_1x",
        lambda: label_propagation(_lvp(docs1), "id_a", "id_b", num_iter=5).count(),
    )
    run(
        "labelprop_10x",
        lambda: label_propagation(_lvp(docs10), "id_a", "id_b", num_iter=5).count(),
    )

    def fuzzy_corpus(docs):
        key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12)
        clean = docs.select(F.col("doc_id").alias("id"), key.alias("s"))
        dirty = docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 100_000_000).alias("id"),
            F.concat(
                F.expr("substr(substr(md5(cast(doc_id as string)), 1, 12), 1, cast(doc_id % 12 as int))"),
                F.lit("z"),
                F.expr("substr(substr(md5(cast(doc_id as string)), 1, 12), cast(doc_id % 12 as int) + 2)"),
            ).alias("s"),
        )
        return clean.unionByName(dirty)

    run(
        "fuzzy_join_1x",
        lambda: fuzzy_join_segments(fuzzy_corpus(docs1), "s", "id", 1).count(),
    )
    run(
        "fuzzy_join_10x",
        lambda: fuzzy_join_segments(fuzzy_corpus(docs10), "s", "id", 1).count(),
    )

    run(
        "path_transitions_1x",
        lambda: path_transitions(ev1, "user_id", "ts", "event_type", "event_id").count(),
    )
    run(
        "path_transitions_10x",
        lambda: path_transitions(ev10, "user_id", "ts", "event_type", "event_id").count(),
    )
    run(
        "attribution_1x",
        lambda: attribution(
            ev1, "user_id", "ts", "event_type", "event_id", "purchase", ["click", "view"], 86400
        ).count(),
    )
    run(
        "attribution_10x",
        lambda: attribution(
            ev10, "user_id", "ts", "event_type", "event_id", "purchase", ["click", "view"], 86400
        ).count(),
    )

    # --- round-4 operators ---
    from pipes_spark.operators.components import shortest_paths
    from pipes_spark.operators.dedup import (
        _minhash_wide,
        minhash_lsh_pairs_delta,
    )
    from pipes_spark.operators.linear_model import auc_roc
    from pipes_spark.operators.sampling import shard_assignment
    from pipes_spark.operators.text import oov_stats

    def copurchase(li):
        return (
            li.select("l_orderkey", F.col("l_partkey").alias("a"))
            .join(li.select("l_orderkey", F.col("l_partkey").alias("b")), "l_orderkey")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )

    li1 = load_table(spark, SF_DIR, "lineitem")
    # 10× graph: id-offset replicas of the edge list (10× vertices/edges,
    # same density — the scale-out direction for a sharded web graph)
    e1 = copurchase(li1).localCheckpoint()
    e10 = reduce(
        lambda a, b: a.unionByName(b),
        [
            e1.select((F.col("a") + c * nn).alias("a"), (F.col("b") + c * nn).alias("b"))
            for c in range(10)
        ],
    ).localCheckpoint()
    run("shortest_paths_1x", lambda: shortest_paths(e1, [0, 1, 2], "a", "b", 4).count())
    run("shortest_paths_10x", lambda: shortest_paths(e10, [0, 1, 2], "a", "b", 4).count())

    run("shard_assign_1x", lambda: shard_assignment(docs1, "doc_id", 100).count())
    run("shard_assign_10x", lambda: shard_assignment(docs10, "doc_id", 100).count())

    def lsh_delta(docs):
        sigs = _minhash_wide(docs, "doc_id", "text", 64, 3).localCheckpoint()
        new_ids = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
        return minhash_lsh_pairs_delta(sigs, new_ids, threshold=0.5).count()

    run("lsh_delta_1x", lambda: lsh_delta(docs1))
    run("lsh_delta_10x", lambda: lsh_delta(docs10))

    ord1 = load_table(spark, SF_DIR, "orders")
    ord10 = reduce(
        lambda a, b: a.unionByName(b),
        [
            ord1.select(
                (F.col("o_orderkey") + c * nn).alias("o_orderkey"),
                "o_custkey",
                "o_orderstatus",
                (F.col("o_totalprice") + F.lit(c * 1e-3)).alias("o_totalprice"),
                "o_orderdate",
                "o_orderpriority",
            )
            for c in range(10)
        ],
    ).localCheckpoint()
    run(
        "auc_1x",
        lambda: auc_roc(ord1, F.col("o_orderstatus") == "F", F.col("o_totalprice")).count(),
    )
    run(
        "auc_10x",
        lambda: auc_roc(ord10, F.col("o_orderstatus") == "F", F.col("o_totalprice")).count(),
    )

    run("oov_1x", lambda: oov_stats(docs1).count())
    run("oov_10x", lambda: oov_stats(docs10).count())

    # --- round-5 operators ---
    from pipes_spark.operators.geo import trajectory_jaccard_pairs
    from pipes_spark.operators.rollup import count_min_estimate, count_min_sketch
    from pipes_spark.operators.sampling import hash_bucket
    from pipes_spark.operators.text import boilerplate_ngram_stats, dsir_importance

    def dsir(docs):
        return dsir_importance(
            docs, docs.filter(F.col("lang") == "en"), num_buckets=1024
        ).count()

    run("dsir_1x", lambda: dsir(docs1))
    run("dsir_10x", lambda: dsir(docs10))

    run("boilerplate_1x", lambda: boilerplate_ngram_stats(docs1, n=2).count())
    run("boilerplate_10x", lambda: boilerplate_ngram_stats(docs10, n=2).count())

    def cm(li):
        sk = count_min_sketch(li, "l_partkey")
        items = li.select("l_partkey").distinct()
        return count_min_estimate(items, sk, "l_partkey").count()

    run("count_min_1x", lambda: cm(li1))
    run("count_min_10x", lambda: cm(li10))

    # DEFAULT path (density_scaled_cells): grid resolution scales with
    # point density, so 10x points ≈ same per-cell posting — pair volume
    # stays in check instead of growing 100x.
    def trajectory(ev):
        from pipes_spark.operators.geo import density_scaled_cells

        pts = ev.select(
            "user_id",
            (hash_bucket(F.col("event_id"), "elat") % 2000).alias("_x"),
            (hash_bucket(F.col("event_id"), "elon") % 2000).alias("_y"),
        )
        visits = density_scaled_cells(
            pts, "_x", "_y", extent=2000.0, target_posting=25
        ).select("user_id", "cell")
        return trajectory_jaccard_pairs(visits, "user_id", "cell", 0.1).count()

    run("trajectory_1x", lambda: trajectory(ev1))
    run("trajectory_10x", lambda: trajectory(ev10))

    # fixed grid + 10x users = 10x postings per cell = 100x candidate
    # pairs — the measured density trap (339 s vs 23 s at 10x) that made
    # density scaling the default; kept as the A/B baseline.
    def trajectory_fixed(ev):
        cell = (
            F.floor((hash_bucket(F.col("event_id"), "elat") % 2000) / F.lit(100)) * 100
            + F.floor((hash_bucket(F.col("event_id"), "elon") % 2000) / F.lit(100))
        ).cast("bigint")
        visits = ev.select("user_id", cell.alias("cell"))
        return trajectory_jaccard_pairs(visits, "user_id", "cell", 0.1).count()

    run("trajectory_10x_fixed_grid", lambda: trajectory_fixed(ev10))


if __name__ == "__main__":
    main()
