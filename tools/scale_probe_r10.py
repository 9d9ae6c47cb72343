#!/usr/bin/env python
"""Round-10 scale probes: quantify the iterative-loop convergence exits
(r9 verdict ask #4 — the LPA precedent from tools/scale_probe_r9.py).

1. pagerank default tol=1e-4 vs fixed 10 rounds on a clique forest
   (150k cliques × 8 = 1.2M vertices, 8.4M directed edges) — the shape
   near-dup/cluster graphs actually have; the uniform start is the exact
   fixed point there, so the default exits after ONE round and the probe
   measures the whole converged tail as saved wall time.
2. pagerank on a random sparse digraph (1M vertices, 4M edges) — a shape
   that does NOT trivially converge: reports the rounds the tol exit
   actually uses vs the 10-round budget.
3. shortest_paths frontier-empty exit: landmarks on a clique forest
   (diameter 1 per component) under an 8-hop budget — the exit fires at
   round 2 and the probe measures budget-vs-actual rounds.

Usage: python tools/scale_probe_r10.py [pr_clique] [pr_random] [bfs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from pipes_spark.session import get_spark

    which = set(sys.argv[1:]) or {"pr_clique", "pr_random", "bfs"}
    spark = get_spark("scale_probe_r10")

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.2f}s {out if out is not None else ''}", flush=True)

    def clique_edges(n_cliques: int, k: int):
        v = spark.range(n_cliques * k).select(
            F.col("id"), (F.col("id") / k).cast("long").alias("cl")
        )
        e = (
            v.alias("a")
            .join(v.alias("b"), F.col("a.cl") == F.col("b.cl"))
            .filter(F.col("a.id") != F.col("b.id"))
            .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
            .persist()
        )
        e.count()
        return e

    if "pr_clique" in which:
        from pipes_spark.operators.components import pagerank

        e = clique_edges(150_000, 8)

        def fixed():
            stats: dict = {}
            pagerank(e, num_iter=10, tol=None, stats=stats).count()
            return stats

        def early():
            stats: dict = {}
            pagerank(e, num_iter=10, stats=stats).count()
            return stats

        run("pagerank clique-forest fixed 10 rounds", fixed)
        run("pagerank clique-forest default tol=1e-4", early)
        e.unpersist()

    if "pr_random" in which:
        from pipes_spark.operators.components import pagerank

        n, m = 1_000_000, 4_000_000
        e = (
            spark.range(m)
            .select(
                (F.xxhash64("id", F.lit(1)) % n).alias("src"),
                (F.xxhash64("id", F.lit(2)) % n).alias("dst"),
            )
            .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
            .persist()
        )
        e.count()

        def fixed():
            stats: dict = {}
            pagerank(e, num_iter=10, tol=None, stats=stats).count()
            return stats

        def early():
            stats: dict = {}
            pagerank(e, num_iter=10, stats=stats).count()
            return stats

        run("pagerank random-4M fixed 10 rounds", fixed)
        run("pagerank random-4M default tol=1e-4", early)
        e.unpersist()

    if "bfs" in which:
        from pipes_spark.operators.components import shortest_paths

        e = clique_edges(150_000, 8)
        landmarks = [0, 8, 16, 24]

        def bfs():
            stats: dict = {}
            shortest_paths(e, landmarks, max_hops=8, stats=stats).count()
            return stats

        run("shortest_paths clique-forest budget 8", bfs)
        e.unpersist()


if __name__ == "__main__":
    main()
