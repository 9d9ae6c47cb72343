#!/usr/bin/env python
"""Round-8 beyond-10× scaling probes for the three operators whose 10×
scaling was worst and output-bound (COVERAGE.md measured-scaling table:
knn_graph 5×, label_propagation 3.4×, graph_modularity 3.2×) — each
probed at ≥30× with its documented volume knob ACTUALLY ENGAGED, so the
table records the knob's measured effect, not just the uncapped curve.

Knobs under test:
- knn_graph: ``floor`` (the declared pair-volume knob — pairs below the
  cosine floor never leave the tile, so the top-k shuffle is bounded).
- label_propagation: ``num_iter`` (round cap — per-round cost is one
  edge×label join + count agg; total time is rounds × per-round).
  The operator's input is an EDGE TABLE, so the ≥30× probe drives it
  directly at 3×/9× the 10× probe's ~450k edges via a deterministic
  synthetic graph — edge volume is the thing that grows at corpus
  scale, and synthesizing it decouples the probe from the (separately
  probed) upstream pair generators.
- graph_modularity: ``num_iter`` of its LPA stage, on the co-purchase
  graph of a 30× id-offset lineitem (orders replicate disjointly, so
  edges grow 30× linearly — the honest scale-out direction).

Usage: python tools/scale_probe_r8.py [probe ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from tools.scale_probe import replicate_embeddings

    from pipes_spark.operators.components import label_propagation, modularity
    from pipes_spark.operators.similarity import knn_graph
    from pipes_spark.session import get_spark
    from pipes_spark.sources import load_table

    spark = get_spark("scale_probe_r8")
    only = set(sys.argv[1:])

    def run(name, fn):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        n = fn()
        print(f"{name}: {time.perf_counter() - t0:.2f}s ({n} rows)", flush=True)

    def selected(prefix: str) -> bool:
        return not only or any(n.startswith(prefix) for n in only)

    def materialize(df):
        """persist + count, NOT localCheckpoint: checkpoint blocks live in
        the BlockManager with no CacheManager entry, so unpersist() on
        them is a silent no-op and the 'release' below would be illusory
        (round-8 review finding). persist() both materializes the input
        outside the measured region and stays releasable."""
        df = df.persist()
        df.count()
        return df

    # materialize inputs only for selected probes — resident input blocks
    # are exactly what OOM'd the first r8 run on the shared heap
    emb10 = emb30 = None
    if selected("knn_"):
        emb1 = load_table(spark, SF_DIR, "embeddings")
        emb10 = materialize(replicate_embeddings(emb1, 10))
        emb30 = materialize(replicate_embeddings(emb1, 30))

    # knob effect at 10× (cheap): floor 0.3 (the COVERAGE baseline) vs 0.75
    run("knn_10x_floor03", lambda: knn_graph(emb10, k=3, floor=0.3).count())
    run("knn_10x_floor075", lambda: knn_graph(emb10, k=3, floor=0.75).count())
    # the beyond-10× point, knob engaged: 60k vectors, floor 0.75
    run("knn_30x_floor075", lambda: knn_graph(emb30, k=3, floor=0.75).count())

    # deterministic synthetic graph: V vertices, E edges, mild skew (the
    # multiplier walk makes dst effectively hash-random; src sweeps 0..V)
    def synth_edges(n_edges: int, n_vertices: int):
        return (
            spark.range(n_edges)
            .select(
                (F.col("id") % n_vertices).alias("src"),
                F.pmod(F.xxhash64(F.col("id")), F.lit(n_vertices)).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
        )

    e3x = e9x = None
    if selected("lpa_"):
        e3x = materialize(synth_edges(1_350_000, 100_000))  # 3× the 10× edges
        e9x = materialize(synth_edges(4_050_000, 300_000))  # 9×
    run("lpa_3xedges_r5", lambda: label_propagation(e3x, num_iter=5).count())
    run("lpa_9xedges_r5", lambda: label_propagation(e9x, num_iter=5).count())
    run("lpa_9xedges_r2", lambda: label_propagation(e9x, num_iter=2).count())

    # free the persisted embedding/edge input blocks before the graph
    # section —
    # holding them while 32 tasks buffer the 18M-row lineitem replica OOMs
    # the shared 8g heap (first r8 probe run died exactly there)
    for df in (emb10, emb30, e3x, e9x):
        if df is None:
            continue
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass

    li1 = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    from functools import reduce

    n = 100_000_000
    # lazy union (no checkpoint): re-scanning the 2-column parquet 30× per
    # action is cheap; materializing 18M rows as storage blocks is not
    li30 = reduce(
        lambda a, b: a.unionByName(b),
        [
            li1.select(
                (F.col("l_orderkey") + c * n).alias("l_orderkey"),
                (F.col("l_partkey") + c * n).alias("l_partkey"),
            )
            for c in range(30)
        ],
    )

    def mod(li, rounds):
        edges = (
            li.alias("a")
            .join(li.alias("b"), "l_orderkey")
            .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
            .select(
                F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
            )
            .distinct()
        )
        labels = label_propagation(edges, num_iter=rounds)
        return modularity(edges, labels, node_col="id", community_col="label").count()

    run("modularity_30x_r5", lambda: mod(li30, 5))
    run("modularity_30x_r2", lambda: mod(li30, 2))


if __name__ == "__main__":
    main()
