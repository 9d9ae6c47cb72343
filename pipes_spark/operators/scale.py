"""Partitioning helpers for compute-heavy operators.

Spark parallelizes a scan by file splits, and a split never crosses a
parquet row-group boundary — so a small input (one row group) yields ONE
task no matter how many cores exist, serializing any CPU-heavy map stage
behind it. ``ensure_min_partitions`` repartitions only when the plan has
fewer partitions than the target, so:

* on a laptop / CI over toy files it buys full-core parallelism for the
  expensive stages (minhash, simhash, all-pairs cosine);
* on a 1000-executor cluster over 100 TB the input already has thousands of
  splits and this is a no-op — no extra shuffle is introduced.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: Optional[int] = None) -> DataFrame:
    """Round-robin repartition to at least ``n`` (default: cluster default
    parallelism) partitions — only if the current plan has fewer."""
    spark = df.sparkSession
    target = n or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
