#!/usr/bin/env python
"""Round-9 second-wave scale probes: 10x volume behaviour of the five
new operators (sketch_theta_diff, quality_l_diversity, stats_cramers_v,
ts_ljung_box, sample_rendezvous_reshard).

Each catalog query runs at sf0.01 and sf0.1 (10x orders/events/docs);
two passes per point, MIN reported (the bench.py steal rationale —
interference is strictly additive one-sided). The reshard probe adds a
synthetic 1M-key point because the documents table is tiny even at
sf0.1: the real knob is keys x n_new candidate rows through one
map-side-combined MAX, so the probe measures exactly that explode.

Usage: python tools/scale_probe_r9b.py [queries] [reshard1m]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pipes_spark.session import get_spark

    which = set(sys.argv[1:]) or {"queries", "reshard1m"}
    spark = get_spark("scale_probe_r9b")

    def best_of(fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    if "queries" in which:
        from pipes_spark.catalog import QUERIES

        names = [
            "sketch_theta_diff",
            "quality_l_diversity",
            "stats_cramers_v",
            "ts_ljung_box",
            "sample_rendezvous_reshard",
        ]
        for name in names:
            fn = QUERIES[name].fn
            times = {}
            for sf in ("sf0.01", "sf0.1"):
                sf_dir = f"/root/testdata/{sf}"
                times[sf] = best_of(lambda: fn(spark, sf_dir).collect())
            ratio = times["sf0.1"] / times["sf0.01"]
            print(
                f"{name}: sf0.01 {times['sf0.01']:.2f}s  sf0.1 "
                f"{times['sf0.1']:.2f}s  (10x data -> {ratio:.1f}x)",
                flush=True,
            )

    if "reshard1m" in which:
        from pyspark.sql import functions as F

        from pipes_spark.operators.sampling import rendezvous_reshard

        keys = spark.range(1_000_000).select(
            F.col("id").cast("string").alias("k")
        )
        dt = best_of(
            lambda: rendezvous_reshard(keys, "k", 8, 10).collect()
        )
        print(
            f"rendezvous_reshard 1M keys x 10 shards (10M candidate rows, "
            f"one conditional-MAX groupBy): {dt:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
