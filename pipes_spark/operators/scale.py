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


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join hardened against hot keys by salting.

    The big (skewed) side gets a uniform salt; the small side is replicated
    once per salt bucket; the join key becomes (keys…, salt), so one hot key
    spreads over ``salt_buckets`` reducers instead of one straggler task.
    Result is identical to the plain join. AQE's skew-join split is the
    first line of defense (enabled in the session factory) — this is the
    explicit fallback when the skew is known up front or AQE cannot split
    (e.g. a broadcast-ineligible dimension with one pathological key).
    """
    from pyspark.sql import functions as F

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.join(
        big.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt")),
        how="cross",
    )
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")
