"""Time-series rollups: pre-aggregated hour grain, re-aggregable to any
coarser grain (the hypertable-continuous-aggregate shape).

At 100 TB of events, answering "daily counts last quarter" from raw rows
scans everything; answering it from an **hourly rollup** scans ~1/1000th.
The rollup keeps only *decomposable* aggregates — count, sum, min, max —
which re-aggregate losslessly to any coarser grain (avg derives as
sum/count). Sums are carried as DECIMAL(28,6) so re-aggregation is
order-exact (see catalog._dsum rationale). Distinct users cannot be exact
under re-aggregation (users span hours); ``hourly_user_sketches`` /
``reaggregate_distinct`` carry them as mergeable HLL sketches instead.

Maintenance paths:

* batch: ``ensure_hourly_rollup`` materializes the rollup once per
  (sf_dir) into the managed warehouse, partitioned by day — queries prune
  to the days they touch (the 100 TB analog partitions by day and buckets
  by event_type).
* streaming: ``streaming_rollup_writer`` appends *finalized* hourly
  windows — append output mode emits a window only once its watermark
  passes, and ALL groups of an hour finalize in the same micro-batch
  (the watermark is global, not per-group), so dynamically overwriting the
  (day, hour) partitions a batch touches is complete and idempotent under
  replay.

The reference has no aggregation library at all (SURVEY §2.C — a rollup
would be hand-kept state in a MiddleFunc, pipe/node.go:19); this operator
is part of the engine's first-class extension surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEY = ["hour", "event_type"]


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Aggregate raw events to the hour grain with decomposable aggregates."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
        .withColumn("day", F.to_date("hour"))
    )


def reaggregate(rollup: DataFrame, grain: str = "day") -> DataFrame:
    """Fold an hourly rollup to a coarser grain ('day', 'week', 'month').

    count/sum add; min/max take min/max; DECIMAL sums stay exact, so the
    result is bit-identical to aggregating the raw rows."""
    return (
        rollup.groupBy(
            F.date_trunc(grain, F.col("hour")).alias(grain), F.col("event_type")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
    )


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])


def ensure_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize (once) and return the managed hourly rollup table for the
    events at ``sf_dir``, partitioned by day for partition pruning."""
    from pipes_spark.sources import load_table

    from pipes_spark.warehouse import clear_stale_location

    name = f"rollup_events_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(name):
        clear_stale_location(spark, name)  # orphan from a previous process
        (
            hourly_rollup(load_table(spark, sf_dir, "events"))
            .write.mode("overwrite")
            .partitionBy("day")
            .saveAsTable(name)
        )
    return spark.table(name)


def hourly_user_sketches(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Hourly HLL sketches of distinct users per (hour, event_type) — the
    aggregate the exact rollup deliberately excludes, carried as a
    *mergeable* Datasketches HllSketch binary (F.hll_sketch_agg, default
    lgConfigK=12 ≈ 1.6 % typical error, 2 KB per group).

    Sketches are the only way distinct counts survive re-aggregation:
    exact per-hour distincts do NOT add up to daily distincts (users span
    hours), but HLL unions do — so the 100 TB pipeline stores 2 KB per
    (hour, type) and answers "daily/weekly/monthly uniques" without ever
    rescanning raw events."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.hll_sketch_agg(user_col).alias("users_hll"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("day", F.to_date("hour"))
    )


def reaggregate_distinct(sketches: DataFrame, grain: str = "day") -> DataFrame:
    """Fold an hourly sketch rollup to a coarser grain: union the HLL
    sketches (lossless sketch merge), then estimate. The estimate is
    identical to sketching the raw rows of the whole grain directly —
    union-then-estimate is exactly how the sketch is built row-wise."""
    return (
        sketches.groupBy(
            F.date_trunc(grain, F.col("hour")).alias(grain), F.col("event_type")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("approx_users"),
            F.sum("n_events").alias("n_events"),
        )
    )


def ensure_hourly_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize (once) the hourly user-sketch rollup beside the exact
    rollup, partitioned by day. Kept as a separate table: the sketch
    column is a different lifecycle (can be rebuilt with a different
    lgConfigK without touching the exact aggregates)."""
    from pipes_spark.sources import load_table

    from pipes_spark.warehouse import clear_stale_location

    name = f"rollup_users_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(name):
        clear_stale_location(spark, name)
        (
            hourly_user_sketches(load_table(spark, sf_dir, "events"))
            .write.mode("overwrite")
            .partitionBy("day")
            .saveAsTable(name)
        )
    return spark.table(name)


def streaming_rollup_writer(
    stream: DataFrame, table: str, watermark: str = "2 hours", **trigger
):
    """Keep ``table`` current from a raw-event stream.

    Append output mode emits each hourly window exactly once, when the
    watermark passes its end — and because the watermark is global, every
    event_type group of that hour finalizes in the SAME micro-batch. A
    batch therefore carries the complete, final content of each
    (day, hour) partition it touches, so dynamic partition overwrite
    (spark.sql.sources.partitionOverwriteMode=dynamic) is both complete
    and idempotent when a batch replays after failure. Windows still open
    at stream end (inside the watermark) are intentionally not emitted —
    the rollup only ever contains finalized hours. Returns the
    StreamingQuery."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
        .select(
            F.col("event_type"),
            "n_events",
            "value_sum",
            "value_min",
            "value_max",
            F.to_date(F.col("w.start")).alias("day"),
            F.col("w.start").alias("hour"),
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        if not spark.catalog.tableExists(table):
            batch_df.write.partitionBy("day", "hour").saveAsTable(table)
        else:
            # positional insert: batch_df's select order above matches the
            # saveAsTable layout (data cols, then partition cols day, hour)
            batch_df.write.mode("overwrite").insertInto(table)

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("append")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def sketch_overlap(
    df: DataFrame,
    set_col: str,
    member_col: str,
) -> DataFrame:
    """Approximate pairwise overlap between member sets (users per event
    type, tokens per source…) by HLL sketch algebra: |A∩B| is estimated
    via inclusion–exclusion |A| + |B| − |A∪B|, where every term comes
    from the SAME per-set sketches — one pass over the data builds k
    sketches, and all k² pair estimates run on the k-row sketch table
    (sketch-union per pair, kilobytes each), never re-reading the data.
    The re-aggregatable form of "shared audience" at 100 TB.

    Returns (set_a, set_b, est_a, est_b, est_union, est_intersection,
    overlap_frac) per unordered pair, where overlap_frac =
    est_intersection / min(est_a, est_b) (the containment-style ratio).
    Estimates are HLL-approximate (±~2% at the default lgk); negatives
    from estimator noise clamp to 0.
    """
    sk = df.groupBy(F.col(set_col).alias("_s")).agg(
        F.hll_sketch_agg(member_col).alias("_sk")
    ).select(
        "_s", "_sk", F.hll_sketch_estimate("_sk").alias("_est")
    )
    a = sk.select(
        F.col("_s").alias("set_a"), F.col("_sk").alias("_ska"), F.col("_est").alias("_ea")
    )
    b = sk.select(
        F.col("_s").alias("set_b"), F.col("_sk").alias("_skb"), F.col("_est").alias("_eb")
    )
    pairs = a.join(b, F.col("set_a") < F.col("set_b"))
    un = F.hll_sketch_estimate(F.hll_union("_ska", "_skb"))
    inter = F.greatest(F.col("_ea") + F.col("_eb") - un, F.lit(0.0))
    return pairs.select(
        "set_a",
        "set_b",
        F.round("_ea", 2).alias("est_a"),
        F.round("_eb", 2).alias("est_b"),
        F.round(un, 2).alias("est_union"),
        F.round(inter, 2).alias("est_intersection"),
        F.round(
            inter / F.nullif(F.least(F.col("_ea"), F.col("_eb")), F.lit(0.0)), 6
        ).alias("overlap_frac"),
    )


def _cm_bucket(item, seed: int, width: int):
    """Portable seed-derived Count-Min bucket: md5-derived 56-bit hash of
    ``seed ':' item`` mod width (the shard_manifest digest pattern — rides
    BIGINT identically in DuckDB, so sketches are oracle-exact)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), item)), 1, 14), 16, 10
        )
        .cast("decimal(38,0)")
        .cast("bigint")
        % width
    )


def count_min_sketch(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of an item stream as
    a ``(seed, bucket, cnt)`` table — at most depth×width rows no matter
    how many items flow through. The sketch is MERGEABLE: sketches of two
    partitions sum element-wise into the sketch of their union (see
    ``count_min_merge``), which is what makes it a per-shard ingest
    artifact at 100 TB — the rollup-table shape, like the HLL sketches
    above, but for frequencies instead of distinct counts.

    Scale shape: each row fans out to ``depth`` (seed, bucket) pairs
    map-side (depth md5 evaluations, whole-stage codegen), then ONE
    map-side-combined aggregate — the shuffle carries at most depth×width
    (long, long, count) triples per map task, regardless of input size.
    """
    from .scale import ensure_min_partitions

    item = F.col(item_col).cast("string")
    pairs = ensure_min_partitions(df).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("bigint").alias("seed"),
                        _cm_bucket(item, s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("_sb")
    )
    return (
        pairs.select(F.col("_sb.seed").alias("seed"), F.col("_sb.bucket").alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise sum of Count-Min sketches built with the same
    (depth, width): the sketch of the unioned streams — the mergeability
    contract that lets shards sketch independently and combine later."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Frequency estimates for ``items`` from a Count-Min sketch: recompute
    each item's ``depth`` buckets, look them up in the BROADCAST sketch
    (≤ depth×width rows), and take the minimum — always ≥ the true count,
    overestimating only on bucket collisions. A bucket the sketch never
    touched reads as 0 (left join + coalesce), so never-seen items
    estimate 0 instead of vanishing. Items-side work is map-side;
    the only shuffle is the per-item min aggregate of (item, cnt) pairs."""
    item = F.col(item_col).cast("string")
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("bigint").alias("seed"),
                        _cm_bucket(item, s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("_sb"),
    ).select(
        F.col(item_col), F.col("_sb.seed").alias("seed"), F.col("_sb.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cm_estimate")
        )
    )


_KMV_SPACE = 72057594037927936  # 2^56: the md5-prefix hash domain


def kmv_hash56(key) -> F.Column:
    """Portable 56-bit uniform hash of a key (first 14 hex chars of md5
    as an integer — the shard_manifest digest convention, bit-identical
    in DuckDB via ('0x' || substr(md5(x),1,14))::BIGINT), the uniform
    order statistic a KMV sketch ranks."""
    k = key if not isinstance(key, str) else F.col(key)
    return F.conv(F.substring(F.md5(k.cast("string")), 1, 14), 16, 10).cast(
        "bigint"
    )


def kmv_overlap(
    df: DataFrame,
    set_col: str,
    key_col: str,
    k: int = 64,
    buckets: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values / theta) distinct sketch over exactly two
    labelled sets, with union and intersection estimates (Beyer et al.,
    SIGMOD 2007; the Theta-sketch set algebra of Dasgupta et al.).

    Each set keeps its k smallest 56-bit key hashes; the k-th smallest
    h_k estimates the distinct count as (k−1)·2^56 / h_k. The sketch is
    MERGEABLE by construction: the k smallest of A∪B lie within
    (k smallest of A) ∪ (k smallest of B), so the union estimate reads
    only sketch rows — the property that lets 100 TB shards sketch
    independently and combine driver-free. Intersection estimates by
    inclusion–exclusion on the ROUNDED per-set estimates. Sets smaller
    than k degrade to their exact distinct count (coalesce fallback).

    Scale shape: the k-smallest selection is two-level — per (set,
    hash-bucket) row_number caps every bucket at k candidates in
    parallel, then the final per-set window ranks only ≤ buckets·k
    survivors, never a whole set on one task. Exact per-set distinct
    counts ride the same pass for the audit columns. Deterministic and
    engine-portable end to end: every estimate is hash-exact against a
    DuckDB oracle, unlike the (also mergeable, JVM-internal) HLL
    sketches in :func:`sketch_overlap`.

    Returns (set_name, n_exact, est) rows: one per input set, one
    'union', one 'intersect' (n_exact via inclusion–exclusion there,
    negative estimator noise included — callers clamp if they need to).
    Output column names are the oracle contract (catalog
    ``sketch_kmv_overlap``).
    """
    from pyspark.sql import Window

    tagged = df.select(
        F.col(set_col).cast("string").alias("_s"),
        F.col(key_col).cast("string").alias("_k"),
        kmv_hash56(F.col(key_col)).alias("_h"),
    )
    both = tagged.unionByName(tagged.withColumn("_s", F.lit("union")))
    exact = (
        both.groupBy("_s")
        .agg(F.count_distinct("_k").cast("bigint").alias("n_exact"))
    )
    dh = both.select("_s", "_h").distinct()
    w_bucket = Window.partitionBy("_s", F.pmod(F.col("_h"), F.lit(buckets))).orderBy(
        "_h"
    )
    survivors = (
        dh.withColumn("_rb", F.row_number().over(w_bucket))
        .filter(F.col("_rb") <= k)
        .drop("_rb")
    )
    w_set = Window.partitionBy("_s").orderBy("_h")
    kth = (
        survivors.withColumn("_rn", F.row_number().over(w_set))
        .filter(F.col("_rn") == k)
        .select("_s", F.col("_h").alias("_hk"))
    )
    per = (
        exact.join(kth, "_s", "left")
        .select(
            F.col("_s").alias("set_name"),
            "n_exact",
            F.coalesce(
                F.round(
                    F.lit(float(k - 1) * _KMV_SPACE) / F.col("_hk").cast("double"), 6
                ),
                F.col("n_exact").cast("double"),
            ).alias("est"),
        )
    )
    inter = (
        per.groupBy()
        .agg(
            F.sum(
                F.when(F.col("set_name") != "union", F.col("n_exact")).otherwise(0)
            ).alias("_np"),
            F.sum(
                F.when(F.col("set_name") == "union", F.col("n_exact")).otherwise(0)
            ).alias("_nu"),
            F.sum(
                F.when(F.col("set_name") != "union", F.col("est")).otherwise(0.0)
            ).alias("_ep"),
            F.sum(
                F.when(F.col("set_name") == "union", F.col("est")).otherwise(0.0)
            ).alias("_eu"),
        )
        .select(
            F.lit("intersect").alias("set_name"),
            (F.col("_np") - F.col("_nu")).cast("bigint").alias("n_exact"),
            F.round(F.col("_ep") - F.col("_eu"), 6).alias("est"),
        )
    )
    return per.unionByName(inter).orderBy("set_name")


def count_min_join_cardinality(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Equi-join cardinality estimate from Count-Min sketch inner products
    (Cormode & Muthukrishnan 2005 §4.2, the AMS-style join-size
    estimator): |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated per seed row as
    the bucket-wise inner product of the two sketches, taking the MIN
    over seeds — always ≥ the true size, overestimating only on bucket
    collisions. THE pre-flight a planner (or a pipeline author sizing an
    expensive join) runs at 100 TB: both sides reduce to depth×width
    integer tables in one map-side-combined pass each, and the estimate
    itself joins kilobytes. The exact count rides along from the
    per-key frequency tables (Σ n_a·n_b — never a row-level join) for
    the audit columns.

    All integer md5-bucket math — hash-exact against the SQL oracle.
    Products and sums route through DECIMAL(38,0): BIGINT·BIGINT
    frequency products overflow LONG under ANSI at the 100 TB design
    point (the marginal/rank-sum rule from the stats operators).

    Returns ONE row: (est_join, exact_join, overcount_ratio).
    """
    sk_a = count_min_sketch(df_a, col_a, depth, width)
    sk_b = count_min_sketch(df_b, col_b, depth, width).withColumnRenamed(
        "cnt", "cnt_b"
    )
    per_seed = (
        sk_a.join(sk_b, ["seed", "bucket"])
        .groupBy("seed")
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(38,0)")
                * F.col("cnt_b").cast("decimal(38,0)")
            ).alias("_ip")
        )
    )
    est = per_seed.agg(F.min("_ip").cast("bigint").alias("est_join"))
    fa = df_a.groupBy(F.col(col_a).cast("string").alias("_k")).agg(
        F.count(F.lit(1)).alias("_na")
    )
    fb = df_b.groupBy(F.col(col_b).cast("string").alias("_k")).agg(
        F.count(F.lit(1)).alias("_nb")
    )
    exact = fa.join(fb, "_k").agg(
        F.coalesce(
            F.sum(
                F.col("_na").cast("decimal(38,0)") * F.col("_nb").cast("decimal(38,0)")
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("exact_join")
    )
    return est.crossJoin(exact).select(
        "est_join",
        "exact_join",
        F.round(
            F.col("est_join").cast("double")
            / F.nullif(F.col("exact_join").cast("double"), F.lit(0.0)),
            6,
        ).alias("overcount_ratio"),
    )


def kmv_sketch(
    df: DataFrame, key_col: str, k: int = 64, buckets: int = 64
) -> DataFrame:
    """Bare KMV sketch of one key stream: the k smallest distinct 56-bit
    key hashes as ``(h)`` rows — ≤ k rows no matter the input size, the
    per-shard/per-batch ingest artifact :func:`kmv_merge` folds. Same
    two-level selection as :func:`kmv_overlap` (per-hash-bucket cap in
    parallel, final rank over ≤ buckets·k survivors)."""
    from pyspark.sql import Window

    dh = df.select(kmv_hash56(F.col(key_col)).alias("h")).distinct()
    wb = Window.partitionBy(F.pmod(F.col("h"), F.lit(buckets))).orderBy("h")
    surv = (
        dh.withColumn("_rb", F.row_number().over(wb))
        .filter(F.col("_rb") <= k)
        .drop("_rb")
    )
    wa = Window.orderBy("h")  # bounded: ≤ buckets·k rows reach this rank
    return (
        surv.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Union KMV sketches: the k smallest of the distinct union of the
    inputs' hash rows — exactly the sketch of the unioned streams (the
    k smallest of A∪B lie within the per-input k-smallests), so shards
    and micro-batches sketch independently and combine lossless-ly."""
    from functools import reduce

    from pyspark.sql import Window

    u = reduce(lambda a, b: a.unionByName(b), sketches).distinct()
    w = Window.orderBy("h")  # bounded: ≤ Σ inputs' k rows
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: (k−1)·2^56 / h_k when
    the sketch is full, the exact sketch size when the stream had fewer
    than k distinct keys. One row ``(n_sketch, est)``."""
    return sketch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise(
                F.lit(float(k - 1) * _KMV_SPACE) / F.max("h").cast("double")
            ),
            6,
        ).alias("est"),
    )


def kmv_a_not_b(
    df: DataFrame,
    set_col: str,
    key_col: str,
    k: int = 64,
    buckets: int = 64,
) -> DataFrame:
    """Theta-sketch A-not-B set difference (the directional operation of
    the Dasgupta et al. Theta set algebra that :func:`kmv_overlap`'s
    inclusion–exclusion can't express without double noise): estimate
    |A∖B| and |B∖A| between the two labelled key sets, plus their
    symmetric difference.

    Math: per set, theta_s is the k-th smallest distinct 56-bit key hash
    (2^56 — i.e. "retain everything" — when the set has fewer than k
    distinct keys); theta = min(theta_A, theta_B). Every retained hash
    below theta is an EXACT member sample of its set at threshold theta
    (the KMV sketch keeps all distinct hashes below its own theta ≥
    theta), so hashes below theta present in exactly one set are an
    unbiased sample of the difference: est(A∖B) = |{h < theta : h ∈ A,
    h ∉ B}| · 2^56 / theta. When both sets are smaller than k the
    estimate degrades to the exact hash-level difference count.

    Scale shape: theta selection is the same two-level rank as
    :func:`kmv_overlap` (per-hash-bucket cap, then a rank over ≤
    buckets·k survivors); the one-row theta joins back as a broadcast
    cross join (stays lazy — no driver collect); the single-set test is
    ONE groupBy on the hash (never a row-level set-vs-set join). Exact
    difference counts ride a parallel groupBy on the key for the audit
    column. Deterministic md5 order-statistic math end to end —
    hash-exact against the DuckDB oracle (catalog ``sketch_theta_diff``).

    Returns (set_name, n_exact, est) rows: one per direction
    (``<a>_not_<b>``), one ``sym_diff``.
    """
    from pyspark.sql import Window

    # dk feeds the exact-count branch and dh; dh feeds theta, the set
    # names, and the below-theta test. NO persist (optimization round 1):
    # both are DISTINCT aggregates, whose group keys cannot be pruned
    # away by any consumer, so every branch references a canonically
    # identical exchange and AQE stage reuse computes each shuffle ONCE
    # (verified on the executed plan: ReusedExchange nodes, one scan) —
    # unlike tfidf's shared branch, where consumer-specific pruning
    # rewrites the aggregate and blocks reuse. What recomputes without a
    # persist is post-shuffle, survivor-bounded work (≤ buckets·k rows
    # per set above theta's exchange; one map-side filter pass over the
    # reused dh exchange); the persists' InMemoryRelation builds cost
    # more than that at every scale (A/B at sf0.1: 1.95 → 1.31 s).
    dk = df.select(
        F.col(set_col).cast("string").alias("_s"),
        F.col(key_col).cast("string").alias("_k"),
        kmv_hash56(F.col(key_col)).alias("_h"),
    ).distinct()
    dh = dk.select("_s", "_h").distinct()
    w_bucket = Window.partitionBy("_s", F.pmod(F.col("_h"), F.lit(buckets))).orderBy(
        "_h"
    )
    surv = (
        dh.withColumn("_rb", F.row_number().over(w_bucket))
        .filter(F.col("_rb") <= k)
        .drop("_rb")
    )
    # k-th smallest survivor per set as ONE bounded aggregation: the
    # bucket-cap window above leaves ≤ buckets·k survivors per set, so a
    # per-set sorted array is memory-bounded by construction — same
    # value as the former rank-window + rn==k filter (k-th smallest per
    # set, 2^56 when a set has fewer than k survivors, min across sets),
    # one exchange and no full per-set sort stage (guide §2.4)
    theta = (
        surv.groupBy("_s")
        .agg(F.sort_array(F.collect_list("_h")).alias("_hs"))
        .select(
            F.when(
                F.size("_hs") >= k, F.element_at("_hs", F.lit(k))
            )
            .otherwise(F.lit(_KMV_SPACE))
            .alias("_th_s")
        )
        .agg(F.min("_th_s").cast("bigint").alias("_theta"))
    )
    # set-name pair (two labelled sets — the kmv_overlap contract); a
    # 1-row aggregate like theta, broadcast not collected. The set count
    # rides along: with 3+ labels the difference math and the
    # lo/hi-derived names would both be silently wrong, so the cardinality
    # is enforced in-plan (the cuped_ab_test raise_error pattern)
    names = dh.agg(
        F.min("_s").alias("_s_lo"),
        F.max("_s").alias("_s_hi"),
        F.count_distinct("_s").alias("_nsets"),
    )
    # hashes below theta present in exactly ONE set: one groupBy on _h
    below = dh.join(F.broadcast(theta)).filter(F.col("_h") < F.col("_theta"))
    only = (
        below.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_ns"),
            F.min("_s").alias("_owner"),
        )
        .filter(F.col("_ns") == 1)
    )
    sk_counts = only.groupBy(F.col("_owner").alias("_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_sk"),
    )
    # exact directional difference: one groupBy on the key
    exact = (
        dk.groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_ns"), F.min("_s").alias("_owner"))
        .filter(F.col("_ns") == 1)
        .groupBy(F.col("_owner").alias("_s"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    # seed from the distinct set names so an empty direction (A ⊆ B)
    # still emits its zero row instead of vanishing from the report
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
                F.when(F.col("_s") == F.col("_s_lo"), F.col("_s_hi")).otherwise(
                    F.col("_s_lo")
                ),
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
    # per feeds its own output rows AND the sym_diff aggregate, and the
    # final orderBy's range sampling re-executes the union child — but
    # every replica of the subtree reads the SAME reused exchanges (see
    # the dk/dh note above), so the recompute is a handful of 2-row
    # broadcast joins; persisting `per` measurably LOST to letting it
    # recompute (all-persists 1.95 / per-only persists in between /
    # no-persist 1.31 s warm-MIN interleaved at sf0.1 — the
    # InMemoryRelation barrier blocks whole-plan stage reuse)
    sym = per.agg(
        F.lit("sym_diff").alias("set_name"),
        F.sum("n_exact").cast("bigint").alias("n_exact"),
        F.round(F.sum("est"), 6).alias("est"),
    )
    return per.unionByName(sym).orderBy("set_name")
