"""Data-profiling operators: per-column summary statistics and per-group
closed-form linear regression — the "know your 100 TB before you train on
it" surface (every curation pipeline starts with a profile pass).

Scale:

* ``profile_table`` is ONE aggregation job producing a single row of
  ``3 + 4·len(cols)`` cells, then a driver-free unpivot into the tall
  report. Exact distinct counts expand the aggregate (one pass per distinct
  column internally via Catalyst's Expand); ``approx=True`` switches to
  HLL++ sketches — one true single pass, the 100 TB default.
* ``linear_fit`` is a plain groupBy over closed-form sufficient statistics
  (Σx, Σy, Σxy, Σx²) accumulated as DECIMAL — exact, order-independent,
  and engine-portable (float Σxy differs across engines by summation
  order; decimal does not). Slope/intercept/R² come out of the normal
  equations in one shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Tall per-column profile: one row per column with null count, exact
    (or HLL-approximate) distinct count, and min/max rendered as strings.

    Output schema: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value) — stable regardless of the profiled columns' types, so
    profiles of different tables union cleanly."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("bigint").alias(f"_nn_{c}"))
        aggs.append(
            (F.approx_count_distinct(col) if approx else F.count_distinct(col))
            .cast("bigint")
            .alias(f"_nd_{c}")
        )
        aggs.append(F.min(col).cast("string").alias(f"_mn_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_mx_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_rows").cast("bigint").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("r")).select(
        "r.column", "r.n_rows", "r.n_nulls", "r.n_distinct", "r.min_value", "r.max_value"
    )


def profile_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`profile_table` (exact mode): one aggregate CTE,
    one UNION ALL unpivot — identical cells."""
    aggs = ["count(*) AS _rows"]
    for c in cols:
        aggs.append(f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS _nn_{c}")
        aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS _nd_{c}")
        aggs.append(f"CAST(min({c}) AS VARCHAR) AS _mn_{c}")
        aggs.append(f"CAST(max({c}) AS VARCHAR) AS _mx_{c}")
    selects = [
        f"SELECT '{c}' AS \"column\", _rows AS n_rows, _nn_{c} AS n_nulls,"
        f" _nd_{c} AS n_distinct, _mn_{c} AS min_value, _mx_{c} AS max_value FROM _p"
        for c in cols
    ]
    return f"WITH _p AS (SELECT {', '.join(aggs)} FROM {table}) " + " UNION ALL ".join(selects)


def linear_fit(
    df: DataFrame,
    group_cols: Sequence[str],
    x: Column,
    y: Column,
    min_points: int = 3,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group ordinary least squares y = slope·x + intercept, closed form.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²); R² from the regression /
    total sum-of-squares identity. Sufficient statistics are DECIMAL(38,6)
    sums — exact, so two engines computing the same normal equations agree
    to the last bit before the shared round(…, 6). Groups with fewer than
    ``min_points`` rows or zero x-variance get NULL slope/intercept/r2.

    One groupBy shuffle; everything else is map-side arithmetic."""
    acc = "decimal(38,6)"
    g = (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum(x.cast(acc)).cast("double").alias("_sx"),
            F.sum(y.cast(acc)).cast("double").alias("_sy"),
            F.sum((x * y).cast(acc)).cast("double").alias("_sxy"),
            F.sum((x * x).cast(acc)).cast("double").alias("_sxx"),
            F.sum((y * y).cast(acc)).cast("double").alias("_syy"),
        )
    )
    n = F.col("n_points").cast("double")
    sx, sy = F.col("_sx"), F.col("_sy")
    sxy, sxx, syy = F.col("_sxy"), F.col("_sxx"), F.col("_syy")
    denom = n * sxx - sx * sx
    sst = n * syy - sy * sy
    ok = (F.col("n_points") >= min_points) & (denom != 0)
    slope = F.when(ok, (n * sxy - sx * sy) / denom)
    intercept = F.when(ok, (sy - slope * sx) / n)
    r2 = F.when(
        ok & (sst != 0),
        ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (denom * sst),
    )
    return g.select(
        *group_cols,
        F.col("n_points"),
        F.round(slope, round_decimals).alias("slope"),
        F.round(intercept, round_decimals).alias("intercept"),
        F.round(r2, round_decimals).alias("r2"),
    )


def linear_fit_sql(
    table: str,
    group_cols: Sequence[str],
    x_expr: str,
    y_expr: str,
    min_points: int = 3,
    where: Optional[str] = None,
) -> str:
    """DuckDB twin of :func:`linear_fit`: identical sufficient statistics and
    normal-equation arithmetic."""
    gc = ", ".join(group_cols)
    wh = f"WHERE {where}" if where else ""
    return f"""
    WITH _g AS (
      SELECT {gc},
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(sum(CAST({x_expr} AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST({y_expr} AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(({x_expr}) * ({y_expr}) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(({x_expr}) * ({x_expr}) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(({y_expr}) * ({y_expr}) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM {table} {wh}
      GROUP BY {gc}
    )
    SELECT {gc}, n_points,
      round(CASE WHEN n_points >= {min_points} AND (n_points * sxx - sx * sx) <> 0
        THEN (n_points * sxy - sx * sy) / (n_points * sxx - sx * sx) END, 6) AS slope,
      round(CASE WHEN n_points >= {min_points} AND (n_points * sxx - sx * sx) <> 0
        THEN (sy - ((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx)) * sx) / n_points END, 6) AS intercept,
      round(CASE WHEN n_points >= {min_points} AND (n_points * sxx - sx * sx) <> 0
                  AND (n_points * syy - sy * sy) <> 0
        THEN ((n_points * sxy - sx * sy) * (n_points * sxy - sx * sy))
             / ((n_points * sxx - sx * sx) * (n_points * syy - sy * sy)) END, 6) AS r2
    FROM _g
    """


def histogram(
    df: DataFrame,
    value: Column,
    bin_width: float,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram, optionally per group: one groupBy shuffle on
    (groups…, bin), map-side combined — the distribution profile that backs
    skew diagnosis and quantile sanity checks at scale. The bin id is
    ``floor(value / bin_width)`` (stable across engines for exact-decimal
    inputs), with per-bin count and min/max so downstream plots need no
    second pass."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    b = F.floor(value / F.lit(bin_width)).cast("bigint")
    return (
        df.withColumn("bin", b)
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min(value), 6).alias("bin_min"),
            F.round(F.max(value), 6).alias("bin_max"),
        )
        .withColumn("bin_lo", F.round(F.col("bin") * bin_width, 6))
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier detection via the modified z-score (Iglewicz &
    Hoaglin 1993): ``0.6745 · (x − median) / MAD`` — immune to the outliers
    dragging the baseline, unlike mean/σ z-scores. Medians are exact
    interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``).

    Two small per-group aggregates (median, then median absolute
    deviation), each broadcast back onto the stream — the value table
    itself shuffles on the group key twice and never sorts globally.
    Zero-MAD groups (>50% identical values) yield NULL scores rather than
    dividing by zero (ANSI-safe)."""
    v = F.col(value_col)
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = df.join(F.broadcast(med), list(group_cols)).withColumn(
        "_dev", F.abs(v - F.col("_med"))
    )
    mad = dev.groupBy(*group_cols).agg(F.expr("percentile(_dev, 0.5)").alias("_mad"))
    z = F.round(
        F.lit(0.6745) * (v - F.col("_med")) / F.nullif(F.col("_mad"), F.lit(0.0)), 6
    )
    return (
        dev.join(F.broadcast(mad), list(group_cols))
        .withColumn("robust_z", z)
        .withColumn("med", F.round(F.col("_med"), 6))
        .withColumn("mad", F.round(F.col("_mad"), 6))
        .filter(F.abs(F.col("robust_z")) >= threshold)
        .drop("_med", "_mad", "_dev")
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equal-frequency (quantile) binning with per-bin stats — the
    length-decile report every curation pipeline starts from.

    Bin ids come from ``ranks.bucketed_ntile`` — exact equal-frequency
    ntile semantics (deterministic via the tiebreak, hash-equal to the
    global-sort form the oracle states) computed bucket-parallel over
    approx-percentile value buckets, so no single-task global sort exists
    at any scale."""
    from .ranks import bucketed_ntile

    v = F.col(value_col)
    return (
        bucketed_ntile(
            df, value_col, [F.col(value_col), F.col(tiebreak_col)], n_bins, "bin"
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
            F.round(F.avg(v), 6).alias("avg_value"),
        )
    )


def fk_profile(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity / foreign-key-candidate audit for one
    (child.key → parent.key) relationship: key cardinalities on both
    sides, how many child keys actually resolve in the parent, the
    containment fraction (1.0 ⇒ the relationship is FK-clean), and the
    orphaned child ROW count — the join-health report to run before
    trusting any join in a new dataset (and the signal FK-discovery
    tools rank candidates by).

    Fully declarative — ONE plan, no driver-side counting loop: child
    keys (with row counts folded in by a pre-aggregate) left-join the
    parent KEY set, one aggregate derives every statistic, and the
    1-row parent-cardinality aggregate cross-joins on. Every shuffle
    carries keys only; the row tables never re-shuffle.
    """
    ck = (
        child.select(F.col(child_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("_rows"))
    )
    pk = (
        parent.select(F.col(parent_key).alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
        .withColumn("_in_parent", F.lit(True))
    )
    stats = (
        ck.join(pk, "k", "left")
        .agg(
            F.sum("_rows").cast("bigint").alias("n_child_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_child_keys"),
            F.count(F.col("_in_parent")).cast("bigint").alias("n_matched_keys"),
            F.sum(F.when(F.col("_in_parent").isNull(), F.col("_rows")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_orphan_rows"),
        )
    )
    parent_stats = pk.agg(F.count(F.lit(1)).cast("bigint").alias("n_parent_keys"))
    return (
        stats.crossJoin(parent_stats)
        .select(
            F.lit(relation).alias("relation"),
            "n_child_rows",
            "n_child_keys",
            "n_parent_keys",
            "n_matched_keys",
            F.round(F.col("n_matched_keys") / F.col("n_child_keys"), 6).alias(
                "containment"
            ),
            "n_orphan_rows",
        )
    )


def skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Join/partition-key skew diagnostic: the ``top_n`` heaviest keys
    with their row counts and share of the table — the first thing to
    look at when a join stalls on its last task (a key with share ≫
    1/shuffle_partitions is the straggler; route it through
    operators.scale.salted_equi_join / AQE skew join).

    One map-side-combined count per key; the top-n selection is
    ``orderBy(...).limit(n)`` — Spark's TakeOrdered, a per-partition
    partial top-k merged on the driver, so the per-key table is never
    globally sorted through one window task even at 10⁹ keys. The table
    total rides as a 1-row aggregate cross-joined broadcast, and the rank
    window runs over the ≤ top_n surviving rows only. The full table
    never re-shuffles.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    total = counts.agg(F.sum("n").alias("_tot"))
    top = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top_n)
    # ≤ top_n rows; constant partition key suppresses the no-partition
    # warning for this trivially-bounded window
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("n").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n") / F.col("_tot"), 6))
        .withColumn("skew_rank", F.row_number().over(w).cast("bigint"))
        .select("key", "n", "share", "skew_rank")
    )


def quality_checks(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Declarative data-quality rule evaluation (the Deequ/Great-
    Expectations pattern): each rule is a tuple —

    * ``("not_null", col)``
    * ``("unique", col)``
    * ``("in_set", col, (v1, v2, …))``
    * ``("in_range", col, lo, hi)``       (inclusive, NULL counts as a
      violation — a NULL price is not "in range")
    * ``("fd", det_col, dep_col)``        (functional dependency: every
      determinant value maps to one dependent value; violations = extra
      distinct dependents over all determinant groups)

    Output: one row per rule with its violation count and pass flag —
    the gate a pipeline checks before promoting a batch.

    Cost: all row-level rules (not_null / in_set / in_range) fold into
    ONE aggregate pass over the table (a sum of indicator columns —
    map-side combined, no shuffle of data rows); each ``unique`` rule
    adds one count-distinct aggregate on its column. The report is
    assembled by unioning 1-row frames — rule count is tiny by nature.
    """
    from functools import reduce

    row_exprs = []
    row_meta = []
    uniq_rules = []
    fd_rules = []
    for r in rules:
        kind = r[0]
        if kind == "not_null":
            row_exprs.append(
                F.sum(F.when(F.col(r[1]).isNull(), 1).otherwise(0)).cast("bigint")
            )
            row_meta.append(("not_null", r[1]))
        elif kind == "in_set":
            c = F.col(r[1])
            row_exprs.append(
                F.sum(
                    F.when(c.isNull() | ~c.isin(*r[2]), 1).otherwise(0)
                ).cast("bigint")
            )
            row_meta.append(("in_set", r[1]))
        elif kind == "in_range":
            c = F.col(r[1])
            row_exprs.append(
                F.sum(
                    F.when(
                        c.isNull() | (c < F.lit(r[2])) | (c > F.lit(r[3])), 1
                    ).otherwise(0)
                ).cast("bigint")
            )
            row_meta.append(("in_range", r[1]))
        elif kind == "unique":
            uniq_rules.append(r[1])
        elif kind == "fd":
            fd_rules.append((r[1], r[2]))
        else:
            raise ValueError(f"unknown rule kind {kind!r}")

    spark = df.sparkSession
    parts = []
    if row_exprs:
        # ONE aggregate row exploded to one row per rule — a UNION of
        # per-rule selects would recompute the aggregate (and rescan the
        # table) once per branch: Spark does no common-subplan reuse
        # across union arms
        agg = df.agg(*[e.alias(f"_v{i}") for i, e in enumerate(row_exprs)])
        structs = [
            F.struct(
                F.lit(kind).alias("rule"),
                F.lit(col).alias("col_name"),
                F.col(f"_v{i}").alias("violations"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            for i, (kind, col) in enumerate(row_meta)
        ]
        parts.append(
            agg.select(F.explode(F.array(*structs)).alias("_r")).select("_r.*")
        )
    for col in uniq_rules:
        # duplicated ROWS beyond the first occurrence of each value count
        # as violations (NULLs participate like any value)
        dup = df.groupBy(col).agg(F.count(F.lit(1)).alias("_n")).agg(
            F.sum(F.when(F.col("_n") > 1, F.col("_n") - 1).otherwise(0))
            .cast("bigint")
            .alias("_v")
        )
        parts.append(
            dup.select(
                F.lit("unique").alias("rule"),
                F.lit(col).alias("col_name"),
                F.col("_v").alias("violations"),
                (F.col("_v") == 0).alias("passed"),
            )
        )
    for det, dep in fd_rules:
        # functional dependency det -> dep: each determinant value must
        # map to ONE dependent value; violations = extra distinct
        # dependents summed over determinant groups
        v = (
            df.groupBy(det)
            .agg((F.count_distinct(F.col(dep)) - 1).alias("_k"))
            .agg(F.sum("_k").cast("bigint").alias("_v"))
        )
        parts.append(
            v.select(
                F.lit("fd").alias("rule"),
                F.lit(f"{det}->{dep}").alias("col_name"),
                F.col("_v").alias("violations"),
                (F.col("_v") == 0).alias("passed"),
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "rule string, col_name string, violations bigint, passed boolean"
        )
    return reduce(DataFrame.unionByName, parts)


def ab_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample experiment readout (Welch): per group-pair sample
    sizes, means, the difference, its standard error, and the Welch
    t-statistic — the A/B-test summary computed entirely from
    re-aggregatable sufficient statistics (n, Σx, Σx²), so ONE
    map-side-combined aggregate pass over the events produces the whole
    readout regardless of table size. Exactly two groups are expected;
    the caller derives ``group_col`` (variant assignment) upstream.

    Sums accumulate as DECIMAL(28,6) (order-independent, engine-exact);
    the handful of final divisions/sqrt are double arithmetic on
    identical inputs, rounded at 6 — the same cross-engine determinism
    contract as the closed-form OLS operator.
    """
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("s1"),
        F.sum(
            (F.col(value_col) * F.col(value_col)).cast("decimal(28,6)")
        ).alias("s2"),
    )
    a = stats.orderBy(group_col).limit(1).select(
        F.col(group_col).alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("s1").alias("s1_a"),
        F.col("s2").alias("s2_a"),
    )
    b = stats.orderBy(F.col(group_col).desc()).limit(1).select(
        F.col(group_col).alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("s1").alias("s1_b"),
        F.col("s2").alias("s2_b"),
    )
    j = a.crossJoin(b)
    mean = lambda s, n: s.cast("double") / n  # noqa: E731
    var = lambda s1, s2, n: (  # noqa: E731
        s2.cast("double") - s1.cast("double") * s1.cast("double") / n
    ) / (n - 1)
    ma, mb = mean(F.col("s1_a"), F.col("n_a")), mean(F.col("s1_b"), F.col("n_b"))
    va = var(F.col("s1_a"), F.col("s2_a"), F.col("n_a"))
    vb = var(F.col("s1_b"), F.col("s2_b"), F.col("n_b"))
    se = F.sqrt(va / F.col("n_a") + vb / F.col("n_b"))
    return j.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(mb - ma, 6).alias("mean_diff"),
        F.round(se, 6).alias("std_err"),
        F.round((mb - ma) / F.nullif(se, F.lit(0.0)), 6).alias("t_stat"),
    )


def correlation_pairs(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle) over numeric
    columns — the feature-redundancy screen — computed from ONE
    map-side-combined aggregate pass collecting every pair's sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy) as DECIMAL(28,6): exact,
    order-independent, so the result is engine-portable bit-for-bit
    after the final rounded double arithmetic. P column pairs cost P·6
    aggregate cells, not P passes."""
    cols = list(cols)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        aggs.append(F.sum(d(c).cast("decimal(28,6)")).alias(f"_s_{c}"))
        aggs.append(F.sum((d(c) * d(c)).cast("decimal(28,6)")).alias(f"_q_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum((d(a) * d(b)).cast("decimal(28,6)")).alias(f"_p_{a}_{b}"))
    agg = df.agg(*aggs)
    n = F.col("_n")
    structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            sa, sb = F.col(f"_s_{a}").cast("double"), F.col(f"_s_{b}").cast("double")
            qa, qb = F.col(f"_q_{a}").cast("double"), F.col(f"_q_{b}").cast("double")
            pab = F.col(f"_p_{a}_{b}").cast("double")
            num = n * pab - sa * sb
            den = F.sqrt((n * qa - sa * sa) * (n * qb - sb * sb))
            structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("corr"),
                    n.alias("n"),
                )
            )
    return agg.select(F.explode(F.array(*structs)).alias("_r")).select("_r.*")


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Winsorized per-group summary: values are clipped at the group's
    exact [lo_q, hi_q] quantiles before averaging — the outlier-robust
    mean every metrics pipeline reaches for when a few extreme rows move
    the plain average.

    Two aggregates over one shuffle grain: exact interpolated quantiles
    per group (percentile — a sort within each group's partition, the
    exact form; swap approx_percentile at 100 TB, same contract as
    profiling.quantile_bins), broadcast-joined back, then the clipped
    DECIMAL mean beside the raw mean and the clip counts.
    """
    q = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(lo_q)).alias("_lo"),
        F.percentile(value_col, F.lit(hi_q)).alias("_hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(q), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(v.cast("decimal(28,6)")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("raw_mean"),
            F.round(
                F.sum(clipped.cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
            F.sum(F.when(v < F.col("_lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(v > F.col("_hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.round(F.min("_lo"), 6).alias("lo_bound"),
            F.round(F.min("_hi"), 6).alias("hi_bound"),
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index — the ML-ops drift metric between a
    reference batch and a current batch of the same numeric feature:
    bins come from the REFERENCE distribution's exact interpolated
    quantiles, both batches are bucketed against them, and
    ``psi = Σ (p_cur − p_ref)·ln(p_cur/p_ref)`` (rule of thumb: <0.1
    stable, 0.1–0.25 drifting, >0.25 shifted).

    Fully declarative (oracle-mirrored): the 1-row boundary aggregate
    (``percentile`` over the reference) cross-joins onto both sides and
    the bucket id is an unrolled ``1 + Σ (v > qᵢ)`` indicator chain —
    plain codegen, no driver-side collect, no UDF. Counts are Laplace-
    smoothed (+1 per bin) so empty bins don't blow up the log; the
    probabilities are exact integer ratios, making the final double
    ln/round engine-portable. Two scans + two tiny aggregates total.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = ref.agg(
        F.percentile(value_col, F.array(*[F.lit(q) for q in qs])).alias("_qb")
    )

    def bucketize(df):
        b = df.crossJoin(F.broadcast(bounds))
        expr = F.lit(1)
        for i in range(1, n_bins):
            expr = expr + F.when(
                F.col(value_col) > F.element_at(F.col("_qb"), i), 1
            ).otherwise(0)
        return b.select(expr.alias("bin"))

    rc = bucketize(ref).groupBy("bin").agg(F.count(F.lit(1)).alias("n_ref"))
    cc = bucketize(cur).groupBy("bin").agg(F.count(F.lit(1)).alias("n_cur"))
    bins = ref.sparkSession.range(1, n_bins + 1).select(F.col("id").cast("int").alias("bin"))
    j = (
        bins.join(rc, "bin", "left")
        .join(cc, "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).cast("bigint").alias("n_cur"),
        )
    )
    tot = Window.partitionBy()
    p_ref = (F.col("n_ref") + 1) / (F.sum("n_ref").over(tot) + n_bins)
    p_cur = (F.col("n_cur") + 1) / (F.sum("n_cur").over(tot) + n_bins)
    contrib = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return j.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round(contrib, 6).alias("psi_contrib"),
    )


def chi_square(
    df: DataFrame,
    col_a: Column,
    col_b: Column,
    round_decimals: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the profiling staple for "is this label correlated with
    that segment" (feature screening, stratification checks, drift vs a
    design assumption).

    One scan to the (a, b) contingency counts, two tiny marginal
    aggregates joined back broadcast, then the closed form
    χ² = Σ (O − E)²/E with E = rowtot·coltot / n and
    dof = (|a|−1)(|b|−1). Everything after the first groupBy runs on the
    contingency table (|a|·|b| rows), so scale cost is the one
    map-side-combined count shuffle. Returns one row
    ``(chi2, dof, n)``; categories with zero marginal cannot occur by
    construction (they'd have no observed rows), so E > 0 for every term.
    """
    obs = (
        df.select(col_a.cast("string").alias("_a"), col_b.cast("string").alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_o"))
    )
    ra = obs.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    cb = obs.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    tot = obs.agg(
        F.sum("_o").alias("_n"),
        F.count_distinct("_a").alias("_ka"),
        F.count_distinct("_b").alias("_kb"),
    )
    j = (
        obs.join(F.broadcast(ra), "_a")
        .join(F.broadcast(cb), "_b")
        .crossJoin(F.broadcast(tot))
    )
    # marginal products run in DOUBLE: a BIGINT·BIGINT product overflows
    # LONG under ANSI once marginals pass ~3e9 (the auc_roc lesson); the
    # expected count feeds float math anyway and stays exact below 2^53
    e = F.col("_ra").cast("double") * F.col("_cb") / F.col("_n")
    term = (F.col("_o") - e) * (F.col("_o") - e) / e
    return j.agg(
        F.round(F.sum(term), round_decimals).alias("chi2"),
        ((F.first("_ka") - 1) * (F.first("_kb") - 1)).cast("bigint").alias("dof"),
        F.first("_n").cast("bigint").alias("n"),
    )


def id_islands(df: DataFrame, id_col: str) -> DataFrame:
    """Gap/island report over an integer id sequence: contiguous runs
    (islands) with their start, end, and length — the completeness audit
    for ingest ("which id ranges are missing after this filter/load").

    Classic gaps-and-islands via the rank-difference identity: over the
    DISTINCT ids in ascending order, ``id − row_number(id)`` is constant
    exactly within a contiguous run, so it labels islands with no lag and
    no running sum. The global rank is ``ranks.bucketed_row_number`` —
    bucket-parallel, no single-task sort at any id cardinality — and
    duplicate ids are pre-collapsed with their row counts so ``n_ids``
    still counts input ROWS (hash-equal to the lag/running-sum form the
    oracle states).
    """
    from .ranks import bucketed_row_number

    idc = F.col(id_col)
    per_id = (
        df.select(idc)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_rows"))
    )
    ranked = bucketed_row_number(per_id, id_col, [idc.asc()], "_rn")
    return (
        ranked.withColumn("_island", idc - F.col("_rn"))
        .groupBy("_island")
        .agg(
            F.min(id_col).alias("island_start"),
            F.max(id_col).alias("island_end"),
            F.sum("_rows").cast("bigint").alias("n_ids"),
        )
        .drop("_island")
    )


def k_anonymity(df: DataFrame, cols: Sequence[str], k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every
    attribute combo observed on FEWER than ``k`` rows is a re-identification
    risk (the release-readiness check run before shipping any derived
    dataset that carries demographic-ish columns).

    One map-side-combined count shuffle keyed on the combo; the report
    carries only violating combos and their counts, so output is bounded
    by the violation set, not the table."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column — the
    classic forensic screen for fabricated or mechanically-generated
    amounts (natural multiplicative data puts ~30.1% of leading digits at
    1; uniform generators put ~11.1%).

    One map-side digit extraction + one 9-group count; expected counts
    come from log10(1 + 1/d) against the in-plan total. Returns one row
    per digit with observed/expected counts, observed share, and the
    per-digit (O−E)²/E contribution (sum them for the chi-square
    statistic against 8 dof). Rows with value < 1 are excluded (no
    stable leading digit)."""
    v = F.col(value_col)
    digit = F.substring(F.floor(v).cast("string"), 1, 1).cast("int")
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    # complete against the 1-9 spine: a digit that never occurs (the very
    # signature this screen hunts) must still contribute its (0-E)^2/E
    obs = spine.join(
        df.filter(v >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n")),
        "digit",
        "left",
    ).select("digit", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"))
    tot = obs.agg(F.sum("n").alias("_t"))
    e = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")) * F.col("_t")
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(e, 6).alias("expected"),
            F.round(F.col("n") / F.col("_t"), 6).alias("share"),
            F.round((F.col("n") - e) * (F.col("n") - e) / e, 6).alias("chi2_part"),
        )
    )


def mann_whitney_u(
    df: DataFrame,
    group: Column,
    value: Column,
    round_decimals: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test of whether one group's
    values are stochastically larger — the nonparametric complement to
    the Welch A/B readout (no normality assumption; the right test for
    skewed metrics like revenue or latency).

    Computed on the GROUPED value domain exactly like ``auc_roc``: one
    aggregate to (value, n₁, n₂), bucket-parallel cumulative counts over
    distinct values (``ranks.bucketed_cumsum`` — no single-partition
    window; hash-equal to the global form), then the doubled-rank-sum
    identity (2·R₁ = Σ n₁(v)·(2·cum(<v) + n(v) + 1)) in exact DECIMAL
    integers. z uses the tie-corrected variance
    n₁n₂/12·((N+1) − Σ(t³−t)/(N(N−1))); only z's final division is
    floating, so both engines agree. Returns one row
    ``(n1, n2, u1, z)``; the two-sided p is 2(1−Φ(|z|)) by lookup."""
    from .ranks import bucketed_cumsum

    per = (
        df.select(group.cast("int").alias("_g"), value.alias("_v"))
        .filter(F.col("_v").isNotNull())  # NULLs would rank below the min
        .groupBy("_v")
        .agg(
            F.sum("_g").cast("long").alias("_n1"),
            (F.count(F.lit(1)) - F.sum("_g")).cast("long").alias("_n2"),
        )
    )
    cum = bucketed_cumsum(per, "_v", {"_c": F.col("_n1") + F.col("_n2")})
    t = (F.col("_n1") + F.col("_n2")).cast("decimal(19,0)")
    r1x2 = F.sum(
        F.col("_n1").cast("decimal(19,0)")
        * (F.lit(2).cast("decimal(19,0)") * F.col("_c").cast("decimal(19,0)") + t + 1)
    )
    ties = F.sum(t * t * t - t)
    agg = cum.agg(
        F.sum("_n1").cast("long").alias("n1"),
        F.sum("_n2").cast("long").alias("n2"),
        r1x2.alias("_r1x2"),
        ties.cast("double").alias("_ties"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    nn = n1 + n2
    u1 = (F.col("_r1x2").cast("double") / 2.0) - n1 * (n1 + 1) / 2.0
    var = n1 * n2 / 12.0 * ((nn + 1) - F.col("_ties") / (nn * (nn - 1)))
    z = (u1 - n1 * n2 / 2.0) / F.sqrt(F.nullif(var, F.lit(0.0)))
    return agg.select(
        "n1",
        "n2",
        F.round(u1, round_decimals).alias("u1"),
        F.round(z, round_decimals).alias("z"),
    )


def theil_sen_slope(
    df: DataFrame,
    x: Column,
    y: Column,
    key: Column,
    sample_fraction: float = 0.05,
    salt: str = "",
) -> DataFrame:
    """Outlier-robust trend estimate: the median of pairwise slopes
    (Theil–Sen) over a DETERMINISTIC hash sample of the rows — a single
    wild point moves OLS arbitrarily but shifts a median of slopes by one
    rank (29% breakdown). The standard robust check next to
    :func:`linear_fit` before trusting a trend.

    Exact Theil–Sen is O(n²) pairs; the estimator keeps its robustness on
    a uniform subsample, so rows pass the portable md5 keep-filter first
    (reproducible across runs/partitionings/engines — the
    ``deterministic_sample`` contract) and all pairs of the SAMPLE are
    formed by a hash-keyed self-join. Size ``sample_fraction`` so the
    sampled count stays in the 10³–10⁴ range at your scale (pairs ~ its
    square); the sampled ids travel with x/y doubles only. Returns one
    row ``(n_sample, n_pairs, slope_ts)`` with the exact median of the
    pairwise slopes."""
    from ..caching import scoped_persist
    from .sampling import hash_bucket

    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
    # persisted: the sample feeds both cross-join sides and the size
    # aggregate; n_sample stays IN-PLAN (no eager action at construction)
    s = scoped_persist(
        df.select(key.alias("_k"), x.cast("double").alias("_x"), y.cast("double").alias("_y"))
        .filter(hash_bucket(F.col("_k"), salt) < int(sample_fraction * (1 << 32)))
    )
    a = s.select(F.col("_k").alias("_ka"), F.col("_x").alias("_xa"), F.col("_y").alias("_ya"))
    b = s.select(F.col("_k").alias("_kb"), F.col("_x").alias("_xb"), F.col("_y").alias("_yb"))
    pairs = (
        a.crossJoin(b)
        .filter((F.col("_ka") < F.col("_kb")) & (F.col("_xa") != F.col("_xb")))
        .select(
            ((F.col("_yb") - F.col("_ya")) / (F.col("_xb") - F.col("_xa"))).alias("_s")
        )
    )
    cnt = s.agg(F.count(F.lit(1)).cast("bigint").alias("n_sample"))
    return (
        pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.expr("percentile(_s, 0.5)"), 6).alias("slope_ts"),
        )
        .crossJoin(F.broadcast(cnt))
        .select("n_sample", "n_pairs", "slope_ts")
    )


def ks_two_sample(
    df: DataFrame,
    group: Column,
    value: Column,
    round_decimals: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic D = max |ECDF₁ − ECDF₂| —
    the distribution-shape test that catches what mean-based tests miss
    (same mean, different spread/modality), completing the family next to
    chi-square and Mann-Whitney.

    Grouped-domain shape again: one aggregate to (value, n₁, n₂),
    INCLUSIVE bucket-parallel cumulative counts over distinct values
    (``ranks.bucketed_cumsum`` — no single-partition window; hash-equal
    to the global form), and the integer identity
    D = max |cum₁·n₂ − cum₂·n₁| / (n₁·n₂) — the max runs over
    exact DECIMAL integers, so D is bit-identical everywhere; only the
    single final division floats. Returns one row ``(n1, n2, ks_d)``."""
    from .ranks import bucketed_cumsum

    per = (
        df.select(group.cast("int").alias("_g"), value.alias("_v"))
        .filter(F.col("_v").isNotNull())  # NULLs would rank below the min
        .groupBy("_v")
        .agg(
            F.sum("_g").cast("long").alias("_n1"),
            (F.count(F.lit(1)) - F.sum("_g")).cast("long").alias("_n2"),
        )
    )
    cum = bucketed_cumsum(
        per, "_v", {"_c1": "_n1", "_c2": "_n2"}, inclusive=True
    ).select("_c1", "_c2")
    gap = F.abs(
        F.col("_c1").cast("decimal(19,0)") * F.col("_N2")
        - F.col("_c2").cast("decimal(19,0)") * F.col("_N1")
    )
    tot = per.agg(
        F.sum("_n1").cast("decimal(19,0)").alias("_N1"),
        F.sum("_n2").cast("decimal(19,0)").alias("_N2"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("_N1").cast("bigint").alias("n1"),
            F.first("_N2").cast("bigint").alias("n2"),
            F.round(
                F.max(gap).cast("double")
                / F.nullif(
                    (F.first("_N1") * F.first("_N2")).cast("double"), F.lit(0.0)
                ),
                round_decimals,
            ).alias("ks_d"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    value: Column,
    tiebreak: Column,
    round_decimals: int = 6,
) -> DataFrame:
    """Gini coefficient of a non-negative quantity — the concentration
    readout ("what share of revenue do the top customers carry"); 0 =
    perfectly equal, →1 = one unit holds everything.

    Rank-sum form G = 2·Σᵢ i·yᵢ / (n·Σy) − (n+1)/n over values sorted
    ascending (deterministic via the tiebreak). Σ i·y accumulates as
    DECIMAL — exact and order-independent — so both engines produce the
    identical coefficient. The rank is the exact global row_number
    computed bucket-parallel (``ranks.bucketed_row_number`` — no
    single-task sort at any cardinality; hash-equal to the global-order
    window the oracle states). Returns one row ``(n, total, gini)``."""
    from .ranks import bucketed_row_number

    ranked = bucketed_row_number(
        df.select(value.cast("double").alias("_y"), tiebreak.alias("_t"))
        .filter(F.col("_y").isNotNull()),  # NULLs would take rank 1, inflate n
        "_y",
        [F.col("_y").asc(), F.col("_t").asc()],
        "_i",
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(F.col("_y").cast("decimal(28,6)")).cast("double"), 2).alias(
            "total"
        ),
        F.round(
            F.lit(2.0)
            * F.sum((F.col("_i") * F.col("_y")).cast("decimal(38,6)")).cast("double")
            / F.nullif(
                F.count(F.lit(1))
                * F.sum(F.col("_y").cast("decimal(28,6)")).cast("double"),
                F.lit(0.0),
            )
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            round_decimals,
        ).alias("gini"),
    )


def bootstrap_mean_ci(
    df: DataFrame,
    value: Column,
    key: Column,
    n_replicates: int = 200,
    alpha: float = 0.05,
    salt: str = "",
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean — interval
    estimation to go with the point tests (Welch / Mann-Whitney / KS):
    resample the rows with replacement ``n_replicates`` times, take each
    replicate's mean, and read the CI off the replicate-mean quantiles.

    Every draw is a pure hash function — replicate b's j-th draw is the
    row ranked ``md5(b#j|boot) mod n`` in the portable hash permutation
    (``sampling.permutation_index``) — so the "random" resampling is
    reproducible across runs, partitionings, and engines, and the oracle
    can restate it verbatim. n stays IN-PLAN (1-row count cross-joined);
    replicate means sum DECIMAL (exact); the quantiles interpolate over
    ``n_replicates`` rows. Cost: n·B draw rows through one index join —
    size the replicate count and/or pre-sample the input so n·B stays in
    the 10⁵–10⁷ range (bootstrap at 100 TB runs on a sample or on
    per-partition aggregates, not raw rows). Returns one row
    ``(n, n_replicates, mean, ci_lo, ci_hi)``."""
    from .sampling import hash_bucket, permutation_index

    if n_replicates < 2:
        raise ValueError(f"n_replicates must be >= 2, got {n_replicates}")
    base = df.select(key.alias("_k"), value.cast("double").alias("_y"))
    idx = permutation_index(base, "_k", salt).join(base, "_k")
    cnt = idx.agg(F.count(F.lit(1)).alias("_n"))
    spark = df.sparkSession
    reps = spark.range(int(n_replicates)).select(F.col("id").alias("_b"))
    draws = (
        idx.select(F.col("_idx").alias("_j"))
        .crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(cnt))
        .select(
            "_b",
            (
                hash_bucket(
                    F.concat(
                        F.col("_b").cast("string"), F.lit("#"), F.col("_j").cast("string")
                    ),
                    salt + "|boot",
                )
                % F.col("_n")
            ).alias("_idx"),
        )
    )
    means = (
        draws.join(idx.select("_idx", "_y"), "_idx")
        .groupBy("_b")
        .agg(
            (
                F.sum(F.col("_y").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_m")
        )
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    overall = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("_y").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean"),
    )
    ci = means.agg(
        F.lit(int(n_replicates)).cast("bigint").alias("n_replicates"),
        F.round(F.expr(f"percentile(_m, {lo!r})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(_m, {hi!r})"), 6).alias("ci_hi"),
    )
    return overall.crossJoin(F.broadcast(ci)).select(
        "n", "n_replicates", "mean", "ci_lo", "ci_hi"
    )


def permutation_test_mean_diff(
    df: DataFrame,
    group: Column,
    value: Column,
    key: Column,
    n_permutations: int = 100,
    salt: str = "",
) -> DataFrame:
    """Two-sample permutation test for the difference in means — the
    assumption-free p-value (no normality, no equal variance; the test
    Welch approximates). Each permutation relabels the pooled rows into
    groups of the ORIGINAL sizes by ranking on a per-replicate portable
    hash — fully deterministic, restated verbatim by the oracle, stable
    across partitionings and engines.

    Shape: the pooled table replicates ``n_permutations`` times (size the
    replicate count / pre-sample the input so N·R stays bounded — at
    scale you permute a sample or group-level aggregates); ranking runs
    in a window PARTITIONED BY replicate, so permutations execute in
    parallel; per-replicate means sum DECIMAL (exact). p uses the
    add-one convention (b+1)/(R+1). Returns one row
    ``(n, n_a, obs_diff, p_value)``."""
    from pyspark.sql import Window

    from .sampling import hash_bucket

    if n_permutations < 1:
        raise ValueError(f"n_permutations must be >= 1, got {n_permutations}")
    base = df.select(
        group.cast("int").alias("_g"),
        value.cast("double").alias("_y"),
        key.cast("string").alias("_k"),
    )
    dec = "decimal(28,6)"
    sizes = base.agg(
        F.sum("_g").cast("long").alias("_na"),
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(F.when(F.col("_g") == 1, F.col("_y")).cast(dec))
        .cast("double")
        .alias("_sa"),
        F.sum(F.when(F.col("_g") == 0, F.col("_y")).cast(dec))
        .cast("double")
        .alias("_sb"),
    )
    spark = df.sparkSession
    reps = spark.range(int(n_permutations)).select(F.col("id").alias("_b"))
    h = hash_bucket(
        F.concat(F.col("_b").cast("string"), F.lit("#"), F.col("_k")), salt + "|permtest"
    )
    w = Window.partitionBy("_b").orderBy(h.asc(), F.col("_k").asc())
    permed = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("_r", F.row_number().over(w))
        .crossJoin(F.broadcast(sizes))
        .withColumn("_ga", (F.col("_r") <= F.col("_na")).cast("int"))
    )
    diffs = permed.groupBy("_b").agg(
        (
            F.sum(F.when(F.col("_ga") == 1, F.col("_y")).cast(dec)).cast("double")
            / F.first("_na")
            - F.sum(F.when(F.col("_ga") == 0, F.col("_y")).cast(dec)).cast("double")
            / (F.first("_n") - F.first("_na"))
        ).alias("_d")
    )
    obs = sizes.select(
        F.col("_n").alias("n"),
        F.col("_na").alias("n_a"),
        F.round(
            F.col("_sa") / F.col("_na") - F.col("_sb") / (F.col("_n") - F.col("_na")),
            6,
        ).alias("obs_diff"),
    )
    extreme = diffs.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            (F.round(F.abs(F.col("_d")), 6) >= F.round(F.abs(F.col("obs_diff")), 6))
            .cast("int")
        ).alias("_extreme")
    )
    return (
        obs.crossJoin(F.broadcast(extreme))
        .select(
            "n",
            "n_a",
            "obs_diff",
            F.round(
                (F.col("_extreme") + 1.0) / F.lit(float(n_permutations) + 1.0), 6
            ).alias("p_value"),
        )
    )


def spearman_corr(
    df: DataFrame,
    x: Column,
    y: Column,
    round_decimals: int = 6,
) -> DataFrame:
    """Spearman rank correlation — Pearson on average ranks, the monotone
    (outlier- and nonlinearity-robust) complement to
    :func:`correlation_pairs` (Pearson sees only linear association; a
    perfect monotone curve scores ρ=1 here).

    Average ranks come from the GROUPED value domain per column (one
    aggregate + one bucket-parallel cumulative pass over distinct values
    each, via ``ranks.bucketed_cumsum`` — never a per-row OR
    single-partition global sort), joined back by value. Ranks are exact
    half-integers, so the Pearson sums over them accumulate as DECIMAL —
    exact, order-independent, engine-identical; the one sqrt/division is
    the only float step. Returns one row ``(n, rho)``."""
    from .ranks import bucketed_cumsum

    base = df.select(x.cast("double").alias("_x"), y.cast("double").alias("_y"))

    def avg_ranks(col: str, out: str) -> DataFrame:
        per = base.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
        cum = bucketed_cumsum(per, col, {"_cum": "_c"})
        return cum.select(
            col,
            (F.col("_cum") + (F.col("_c") + 1) / 2.0).alias(out),
        )

    ranked = base.join(avg_ranks("_x", "_rx"), "_x").join(
        avg_ranks("_y", "_ry"), "_y"
    )
    acc = "decimal(38,6)"
    g = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_rx").cast(acc)).cast("double").alias("_sx"),
        F.sum(F.col("_ry").cast(acc)).cast("double").alias("_sy"),
        F.sum((F.col("_rx") * F.col("_ry")).cast(acc)).cast("double").alias("_sxy"),
        F.sum((F.col("_rx") * F.col("_rx")).cast(acc)).cast("double").alias("_sxx"),
        F.sum((F.col("_ry") * F.col("_ry")).cast(acc)).cast("double").alias("_syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.sqrt(
        (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        * (n * F.col("_syy") - F.col("_sy") * F.col("_sy"))
    )
    return g.select(
        "n", F.round(num / F.nullif(den, F.lit(0.0)), round_decimals).alias("rho")
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way ANOVA: does the mean of ``value_col`` differ across the
    levels of ``group_col`` more than within-group noise explains? The
    F-statistic generalizes the two-sample t-test to k groups — the first
    question asked of any segment/variant/source breakdown before
    trusting per-group means.

    One row out: group count, total n, between/within sum-of-squares,
    and F = (SSB/(k−1)) / (SSW/(n−k)). Degrees of freedom ride along so
    a caller can look up the p-value against F(k−1, n−k).

    Scale: ONE map-side-combinable aggregation over the data (per-group
    n, Σv as DECIMAL(28,6), Σv² as DECIMAL(38,6) on 6-decimal-quantized
    values — the linear_fit convention: per-term decimals identical in
    both engines, order-independent sums), then a second aggregate over
    the k-row group table. Per-group float terms S_g²/n_g round(6) then
    DECIMAL-sum so both engines combine groups identically. NULL values
    and NULL groups are excluded; F is NULL when a degree of freedom or
    SSW is zero (k=1, n=k, or perfectly constant groups) rather than a
    DIVIDE_BY_ZERO throw.
    """
    g = df.select(
        F.col(group_col).alias("_g"),
        F.round(F.col(value_col).cast("double"), 6).alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    per = g.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_v").cast("decimal(28,6)")).alias("_s"),
        F.sum((F.col("_v") * F.col("_v")).cast("decimal(38,6)")).alias("_q"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("_n").cast("bigint").alias("n_total"),
        F.sum("_s").cast("double").alias("_S"),
        F.sum("_q").cast("double").alias("_Q"),
        F.sum(
            F.round(
                F.col("_s").cast("double") * F.col("_s").cast("double") / F.col("_n"),
                6,
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("_A"),
    )
    ssb = F.col("_A") - F.col("_S") * F.col("_S") / F.col("n_total")
    ssw = F.col("_Q") - F.col("_A")
    df1 = (F.col("n_groups") - 1).cast("bigint")
    df2 = (F.col("n_total") - F.col("n_groups")).cast("bigint")
    return tot.select(
        "n_groups",
        "n_total",
        df1.alias("df_between"),
        df2.alias("df_within"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(
            (ssb / F.nullif(df1.cast("double"), F.lit(0.0)))
            / F.nullif(ssw / F.nullif(df2.cast("double"), F.lit(0.0)), F.lit(0.0)),
            6,
        ).alias("f_stat"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa: chance-corrected agreement between two categorical
    labelings of the same items — the standard inter-annotator (or
    model-vs-gold) agreement statistic behind every labeling-quality
    gate. κ = (p_o − p_e)/(1 − p_e) where p_o is raw agreement and p_e
    the agreement two independent raters with these marginals would
    reach by chance; κ≈0 means the observed agreement is all chance.

    Scale: one pass for (n, agreements), one small marginal aggregate
    per rater, and the chance term is a class-keyed join of the two
    marginal tables — every shuffle carries class-count rows only. All
    counting is exact integer; marginal PRODUCTS go through
    DECIMAL(38,0) (BIGINT·BIGINT overflows LONG under ANSI at the
    100 TB design point); the two divisions run in DOUBLE at the end.
    Rows with a NULL label on either side are excluded. κ is NULL when
    p_e = 1 (both raters constant — chance explains everything).
    """
    base = df.select(
        F.col(rater_a).alias("_a"), F.col(rater_b).alias("_b")
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum((F.col("_a") == F.col("_b")).cast("bigint"))
        .cast("bigint")
        .alias("_agree"),
    )
    ma = base.groupBy("_a").agg(F.count(F.lit(1)).alias("_na"))
    mb = base.groupBy("_b").agg(F.count(F.lit(1)).alias("_nb"))
    pe_num = (
        ma.join(mb, ma["_a"] == mb["_b"])
        .agg(
            F.coalesce(
                F.sum(F.col("_na").cast("decimal(38,0)") * F.col("_nb")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_pe_num")
        )
    )
    po = F.col("_agree") / F.col("n_items").cast("double")
    pe = F.col("_pe_num").cast("double") / (
        F.col("n_items").cast("double") * F.col("n_items")
    )
    return tot.crossJoin(F.broadcast(pe_num)).select(
        "n_items",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 6).alias("kappa"),
    )


def tukey_hsd(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Tukey HSD pairwise contrasts — the post-hoc step after a
    significant ANOVA: for every pair of groups, the mean difference and
    the studentized-range statistic q = |μ_a − μ_b| / √(MSW/2·(1/n_a +
    1/n_b)), compared against the studentized-range distribution to see
    WHICH groups differ (ANOVA only says that some do).

    Scale: the same single sufficient-statistics pass as
    :func:`anova_oneway` (per-group n/Σv/Σv², DECIMAL-exact), then all
    pairwise arithmetic runs on the k-row group table — a k² self-join
    of a broadcast-sized aggregate, never a second data pass. q is NULL
    when MSW is zero (perfectly constant groups). Values quantize to 6
    decimals; within-group mean-square combines per-group terms with the
    round-then-DECIMAL-sum convention so both engines agree exactly.
    """
    g = df.select(
        F.col(group_col).alias("_g"),
        F.round(F.col(value_col).cast("double"), 6).alias("_v"),
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    from ..caching import scoped_persist

    per = scoped_persist(
        g.groupBy("_g").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_v").cast("decimal(28,6)")).alias("_s"),
            F.sum((F.col("_v") * F.col("_v")).cast("decimal(38,6)")).alias("_q"),
        )
    )
    msw = per.agg(
        (
            (
                F.sum("_q").cast("double")
                - F.sum(
                    F.round(
                        F.col("_s").cast("double") * F.col("_s").cast("double")
                        / F.col("_n"),
                        6,
                    ).cast("decimal(28,6)")
                ).cast("double")
            )
            / F.nullif(
                (F.sum("_n") - F.count(F.lit(1))).cast("double"), F.lit(0.0)
            )
        ).alias("_msw")
    )
    a = per.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("_na"),
        (F.col("_s").cast("double") / F.col("_n")).alias("_ma"),
    )
    b = per.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("_nb"),
        (F.col("_s").cast("double") / F.col("_n")).alias("_mb"),
    )
    se = F.sqrt(
        F.col("_msw")
        / F.lit(2.0)
        * (F.lit(1.0) / F.col("_na") + F.lit(1.0) / F.col("_nb"))
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            "group_a",
            "group_b",
            F.col("_na").cast("bigint").alias("n_a"),
            F.col("_nb").cast("bigint").alias("n_b"),
            F.round(F.col("_ma") - F.col("_mb"), 6).alias("mean_diff"),
            F.round(
                F.abs(F.col("_ma") - F.col("_mb"))
                / F.nullif(se, F.lit(0.0)),
                6,
            ).alias("q_stat"),
        )
    )


def observed_quality_metrics(
    df: DataFrame, metrics: "dict[str, Column]"
) -> DataFrame:
    """Data-quality counters piggybacked on a single pass via Spark's
    ``Observation`` API: the metrics are computed AS the rows stream
    through an action (here a ``noop``-format write — all scan and
    filter work, no output), so the profile costs zero extra passes over
    the data. The production shape: attach the same observation to the
    pipeline's real write and get row counts / null counts / sums for
    free with the job.

    Returns the observed metrics as a one-row DataFrame (column order =
    dict order)."""
    from pyspark.sql import Observation, Row

    obs = Observation("quality")
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    spark = df.sparkSession
    return spark.createDataFrame([Row(**{n: got[n] for n in metrics})])


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal–Wallis H test — the k-group rank generalization of
    Mann–Whitney (and the nonparametric sibling of :func:`anova_oneway`):
    do the groups' value DISTRIBUTIONS differ, with no normality
    assumption. The right k-way test for skewed metrics.

    Computed on the GROUPED value domain like ``mann_whitney_u``: one
    aggregate to (value, group) counts, a bucket-parallel cumulative pass
    over the distinct values (``ranks.bucketed_cumsum`` — no
    single-partition window; hash-equal to the global form), doubled
    average ranks 2·r̄(v) = 2·cum(<v) + n(v) + 1
    in exact DECIMAL integers, per-group rank sums, then
    H = [12/(N(N+1))·Σ R_g²/n_g − 3(N+1)] / [1 − Σ(t³−t)/(N³−N)] with
    the tie correction. Per-group R_g²/n_g routes through DOUBLE
    (squared rank sums exceed DECIMAL(38) at the 100 TB design point)
    with the round-then-DECIMAL-sum convention over the k rows. H is
    NULL when every value ties (the correction divisor hits zero).
    Returns one row (n_total, n_groups, df, h_stat).
    """
    pv = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).filter(F.col("_g").isNotNull() & F.col("_v").isNotNull())
    from ..caching import scoped_persist

    per_v = scoped_persist(
        pv.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_nv"))
    )
    from .ranks import bucketed_cumsum

    cum_v = bucketed_cumsum(per_v, "_v", {"_cum": "_nv"}).withColumn(
        "_cum", F.col("_cum").cast("long")
    )
    per_vg = pv.groupBy("_v", "_g").agg(
        F.count(F.lit(1)).cast("long").alias("_nvg")
    )
    dec = "decimal(38,0)"
    rg = (
        per_vg.join(cum_v, "_v")
        .groupBy("_g")
        .agg(
            F.sum("_nvg").cast("long").alias("_ng"),
            F.sum(
                F.col("_nvg").cast(dec)
                * (
                    F.lit(2).cast(dec) * F.col("_cum")
                    + F.col("_nv")
                    + F.lit(1)
                )
            ).alias("_r2g"),  # 2·R_g, exact
        )
    )
    ties = per_v.agg(
        F.sum(
            F.col("_nv").cast(dec) * F.col("_nv") * F.col("_nv") - F.col("_nv")
        )
        .cast("double")
        .alias("_t")
    )
    tot = rg.agg(
        F.sum("_ng").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(
            F.round(
                F.col("_r2g").cast("double") * F.col("_r2g").cast("double")
                / (F.lit(4.0) * F.col("_ng")),
                6,
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("_a"),
    )
    n = F.col("n_total").cast("double")
    h_raw = F.lit(12.0) / (n * (n + 1)) * F.col("_a") - F.lit(3.0) * (n + 1)
    corr = F.lit(1.0) - F.col("_t") / F.nullif(n * n * n - n, F.lit(0.0))
    return tot.crossJoin(F.broadcast(ties)).select(
        "n_total",
        "n_groups",
        (F.col("n_groups") - 1).cast("long").alias("df"),
        F.round(h_raw / F.nullif(corr, F.lit(0.0)), 6).alias("h_stat"),
    )


def cuped_ab_test(
    df: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED-adjusted A/B readout (Deng et al. 2013): the experiment
    metric y is replaced by y* = y − θ(x − x̄), where x is the SAME
    unit's pre-experiment metric and θ = cov(x,y)/var(x) — removing the
    between-user variance that the pre-period already explains. The
    industry-standard variance-reduction trick: same unbiased lift,
    tighter confidence, smaller/faster experiments.

    ONE aggregation pass: per-variant sufficient statistics (n, Σx, Σy,
    Σx², Σy², Σxy — DECIMAL-exact) plus the pooled 1-row θ/x̄ aggregate
    cross-joined back; every adjusted mean and variance is derived
    algebraically from those sums, so no second data pass and no
    materialized y* column. Returns one row: θ, per-variant adjusted
    means, diff, Welch t on the adjusted metric, and the pooled
    variance-reduction fraction. Exactly two variants are REQUIRED and
    enforced in-plan (``raise_error`` at runtime otherwise — one or
    three variants would silently produce plausible-looking numbers);
    name order decides a/b. Rows with a NULL pre or post metric are
    excluded on both the operator and oracle sides.
    """
    acc = "decimal(38,6)"

    def sufficient(grouped):
        return grouped.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_x").cast(acc)).cast("double").alias("sx"),
            F.sum(F.col("_y").cast(acc)).cast("double").alias("sy"),
            F.sum((F.col("_x") * F.col("_x")).cast(acc)).cast("double").alias("sxx"),
            F.sum((F.col("_y") * F.col("_y")).cast(acc)).cast("double").alias("syy"),
            F.sum((F.col("_x") * F.col("_y")).cast(acc)).cast("double").alias("sxy"),
        )

    base = df.select(
        F.col(variant_col).alias("_v"),
        F.round(F.col(pre_col).cast("double"), 6).alias("_x"),
        F.round(F.col(post_col).cast("double"), 6).alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    from ..caching import scoped_persist

    base = scoped_persist(base)
    pooled = sufficient(base.groupBy()).select(
        F.col("n").alias("_np"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
            )
        ).alias("_theta"),
        (F.col("sx") / F.col("n")).alias("_xbar"),
        (
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0))
        ).alias("_vary"),
    )
    per = sufficient(base.groupBy("_v")).crossJoin(F.broadcast(pooled))
    th = F.col("_theta")
    c = th * F.col("_xbar")
    n = F.col("n").cast("double")
    sy_star = F.col("sy") - th * F.col("sx") + n * c
    syy_star = (
        F.col("syy")
        + th * th * F.col("sxx")
        + n * c * c
        - 2 * th * F.col("sxy")
        + 2 * c * F.col("sy")
        - 2 * c * th * F.col("sx")
    )
    enriched = per.select(
        "_v",
        "n",
        "_theta",
        "_vary",
        (sy_star / n).alias("_m"),
        (
            (syy_star - sy_star * sy_star / n)
            / F.nullif((F.col("n") - 1).cast("double"), F.lit(0.0))
        ).alias("_s2"),
    )
    a = enriched.orderBy("_v").limit(1).select(
        F.col("_v").alias("variant_a"), F.col("n").alias("n_a"),
        F.col("_m").alias("_ma"), F.col("_s2").alias("_s2a"),
        "_theta", "_vary",
    )
    b = enriched.orderBy(F.col("_v").desc()).limit(1).select(
        F.col("_v").alias("variant_b"), F.col("n").alias("n_b"),
        F.col("_m").alias("_mb"), F.col("_s2").alias("_s2b"),
    )
    nv = enriched.agg(F.count(F.lit(1)).cast("long").alias("_nv"))
    j = a.crossJoin(b).crossJoin(F.broadcast(nv))
    se = F.sqrt(
        F.col("_s2a") / F.col("n_a") + F.col("_s2b") / F.col("n_b")
    )
    pooled_var_star = (
        (F.col("n_a") - 1).cast("double") * F.col("_s2a")
        + (F.col("n_b") - 1).cast("double") * F.col("_s2b")
    ) / F.nullif((F.col("n_a") + F.col("n_b") - 2).cast("double"), F.lit(0.0))
    # a wrong variant derivation must FAIL, not return plausible numbers:
    # with one variant a == b (silent zero diff), with three the middle
    # one silently drops while θ was fit pooled — raise at runtime instead
    two = F.when(
        F.col("_nv") == 2, F.lit(1)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cuped_ab_test expects exactly 2 variants, got "),
                F.col("_nv").cast("string"),
            )
        )
    )
    return j.select(
        "variant_a",
        "variant_b",
        (F.col("n_a") * two).alias("n_a"),
        "n_b",
        F.round("_theta", 6).alias("theta"),
        F.round("_ma", 6).alias("adj_mean_a"),
        F.round("_mb", 6).alias("adj_mean_b"),
        F.round(F.col("_ma") - F.col("_mb"), 6).alias("diff"),
        F.round(
            (F.col("_ma") - F.col("_mb")) / F.nullif(se, F.lit(0.0)), 6
        ).alias("t_welch"),
        F.round(
            F.lit(1.0) - pooled_var_star / F.nullif(F.col("_vary"), F.lit(0.0)), 6
        ).alias("var_reduction"),
    )


def ab_power_analysis(
    df: DataFrame,
    value_col: str,
    mde_fracs=(0.01, 0.02, 0.05, 0.10),
    z_alpha: float = 1.959964,
    z_beta: float = 0.841621,
) -> DataFrame:
    """Experiment sizing: per-arm sample size needed to detect a relative
    lift of ``mde`` on this metric at α=0.05 (two-sided) / 80% power —
    n = 2·(z_α/2 + z_β)²·σ²/δ², with σ² and the mean measured from the
    data in ONE DECIMAL-exact pass. The planning step before events_cuped
    runs the experiment (and the reason to run CUPED at all: divide these
    n's by 1/(1−var_reduction)).

    The z constants ride in as literals (both engines have no inverse
    normal CDF — 1.96/0.84 are the textbook 95%/80% values). One row per
    requested MDE with the absolute δ and the per-arm n (ceil'd).
    """
    stats = df.select(
        F.round(F.col(value_col).cast("double"), 6).alias("_v")
    ).filter(F.col("_v").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_observed"),
        F.sum(F.col("_v").cast("decimal(28,6)")).cast("double").alias("_s"),
        F.sum((F.col("_v") * F.col("_v")).cast("decimal(38,6)"))
        .cast("double")
        .alias("_q"),
    )
    mean = F.col("_s") / F.col("n_observed")
    var = (F.col("_q") - F.col("_s") * F.col("_s") / F.col("n_observed")) / F.nullif(
        (F.col("n_observed") - 1).cast("double"), F.lit(0.0)
    )
    spark = df.sparkSession
    mdes = spark.createDataFrame(
        [(float(m),) for m in mde_fracs], "mde_frac double"
    )
    k = (z_alpha + z_beta) ** 2
    delta = mean * F.col("mde_frac")
    return (
        stats.crossJoin(F.broadcast(mdes))
        .select(
            "mde_frac",
            "n_observed",
            F.round(mean, 6).alias("metric_mean"),
            F.round(var, 6).alias("metric_var"),
            F.round(delta, 6).alias("abs_delta"),
            F.ceil(
                F.lit(2.0 * k) * var / F.nullif(delta * delta, F.lit(0.0))
            )
            .cast("bigint")
            .alias("n_per_arm"),
        )
        .orderBy("mde_frac")
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Normalized mutual information between two categorical columns:
    I(X;Y) / √(H(X)·H(Y)) ∈ [0, 1] — the info-theoretic dependency
    strength (0 = independent, 1 = bijective), the soft complement to
    quality_fd's hard functional-dependency check and chi-square's
    significance test: NMI says HOW MUCH one column explains another,
    scale-free.

    One count shuffle to the (a, b) contingency cells; marginals reduce
    from the cell table; every plogp term is an exact-integer ratio fed
    to ln, rounded(9) then DECIMAL-summed (the perplexity convention at
    higher precision — entropy sums are small), and the final
    normalization divides once in double. NULLs excluded; NMI is NULL
    when either column is constant (zero entropy).
    """
    from ..caching import scoped_persist

    dec = "decimal(28,9)"
    cells = scoped_persist(
        df.select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    n_tot = cells.agg(F.sum("_n").cast("double").alias("_N"))
    ma = cells.groupBy("_a").agg(F.sum("_n").cast("long").alias("_na"))
    mb = cells.groupBy("_b").agg(F.sum("_n").cast("long").alias("_nb"))

    def ent(marg, cnt):
        return (
            marg.crossJoin(F.broadcast(n_tot))
            .agg(
                F.sum(
                    F.round(
                        -(F.col(cnt) / F.col("_N"))
                        * F.log(F.col(cnt) / F.col("_N")),
                        9,
                    ).cast(dec)
                )
                .cast("double")
                .alias("h")
            )
        )

    ha = ent(ma, "_na").select(F.col("h").alias("_ha"))
    hb = ent(mb, "_nb").select(F.col("h").alias("_hb"))
    # rename the marginal keys: all three tables share the cells lineage
    # and same-named attributes trip the self-join ambiguity check
    ma2 = ma.select(F.col("_a").alias("_a2"), "_na")
    mb2 = mb.select(F.col("_b").alias("_b2"), "_nb")
    cjoin = cells.select("_a", "_b", F.col("_n").alias("_ncell"))
    joint = (
        cjoin.join(F.broadcast(ma2), F.col("_a") == F.col("_a2"))
        .join(F.broadcast(mb2), F.col("_b") == F.col("_b2"))
        .crossJoin(F.broadcast(n_tot))
        .agg(
            F.sum(
                F.round(
                    (F.col("_ncell") / F.col("_N"))
                    * F.log(
                        F.col("_ncell").cast("double")
                        * F.col("_N")
                        / (F.col("_na").cast("double") * F.col("_nb"))
                    ),
                    9,
                ).cast(dec)
            )
            .cast("double")
            .alias("_mi")
        )
    )
    return (
        joint.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.round("_mi", 6).alias("mutual_information"),
            F.round("_ha", 6).alias("entropy_a"),
            F.round("_hb", 6).alias("entropy_b"),
            F.round(
                F.col("_mi")
                / F.nullif(F.sqrt(F.col("_ha") * F.col("_hb")), F.lit(0.0)),
                6,
            ).alias("nmi"),
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keyed snapshot diff: classify every key as added / removed /
    changed / unchanged between two table versions and count which
    columns changed — the row-level audit behind "what did this
    re-export actually change" (shard_manifest answers the yes/no form;
    this names the rows and columns). NULL-safe comparison via the
    eqNullSafe operator, so NULL→value and value→NULL both count as
    changes.

    Scale: ONE full-outer join on the keys (the inherent cost of a diff)
    with comparison columns only in the payload; the per-column change
    flags fold into one aggregate. Returns one row per status with
    n_rows plus a map of column → changed-row count (changed rows only).
    """
    cmp_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys and c in old.columns]
    )
    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, [f"_k_{k}" for k in keys], "full_outer")
    any_change = F.lit(False)
    for c in cmp_cols:
        any_change = any_change | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    flagged = j.select(
        status.alias("status"),
        *[
            (~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).alias(f"_chg_{c}")
            for c in cmp_cols
        ],
    )
    return flagged.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            F.sum(
                F.when(
                    (F.col("status") == "changed") & F.col(f"_chg_{c}"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"chg_{c}")
            for c in cmp_cols
        ],
    )


def huber_location(
    df: DataFrame,
    group_col: str,
    value_col: str,
    delta: float = 1.345,
    iters: int = 8,
) -> DataFrame:
    """Per-group Huber M-estimate of location by IRLS (Huber 1964): the
    robust mean that downweights observations beyond delta·scale instead
    of trimming them — the estimator between the mean (delta→∞) and the
    median (delta→0), completing the robust family next to mad_outliers
    and winsorize_stats. Scale is the standard MAD·1.4826.

    Fully IN-PLAN iteration: every IRLS round is one join of the data
    against the (groups × 3)-row parameter table plus one weighted-mean
    aggregate — no driver-side scalar collects (contrast fit_fellegi_
    sunter's documented per-round collect contract), so constructing the
    result fires no Spark job and the whole fixed-depth recursion
    optimizes as one Catalyst plan. At 100 TB each round is one
    broadcast join + one map-side-combined aggregate over the data.

    Returns (group, n, scale, huber_mean).
    """
    g = group_col
    base = df.select(F.col(g), F.col(value_col).cast("double").alias("_x"))
    med = base.groupBy(g).agg(F.percentile("_x", 0.5).alias("_med"))
    scale = (
        base.join(F.broadcast(med), g)
        .groupBy(g)
        .agg(
            (F.percentile(F.abs(F.col("_x") - F.col("_med")), 0.5) * 1.4826).alias(
                "_s"
            )
        )
    )
    params = (
        base.groupBy(g)
        .agg(F.avg("_x").alias("_mu"), F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(scale), g)
    )
    for _ in range(iters):
        j = base.join(F.broadcast(params.select(g, "_mu", "_n", "_s")), g)
        r = F.abs(F.col("_x") - F.col("_mu"))
        thr = F.lit(delta) * F.greatest(F.col("_s"), F.lit(1e-12))
        w = F.when(r <= thr, F.lit(1.0)).otherwise(thr / r)
        params = j.groupBy(g).agg(
            (F.sum(w * F.col("_x")) / F.sum(w)).alias("_mu"),
            F.max("_n").alias("_n"),
            F.max("_s").alias("_s"),
        )
    return params.select(
        F.col(g),
        F.col("_n").cast("bigint").alias("n"),
        F.round("_s", 6).alias("scale"),
        F.round("_mu", 6).alias("huber_mean"),
    )


def _p_step_adjust(df, p_col, test_col, alpha, variant):
    """Shared scaffold of the multiple-testing corrections: NULL-p rows
    are excluded (they hold no rank and must not inflate m), the
    ascending-p rank is bucket-parallel, m rides as a 1-row in-plan
    broadcast, and the step envelope is a bucketed running min/max over
    the DISTINCT rank (exact re-association). ``variant`` picks the
    per-row q and the envelope direction; BY additionally folds the
    harmonic c(m) from the ranked table (DECIMAL-quantized per-rank
    terms — exact and order-independent) and scope-persists the ranked
    frame so the c aggregate does not re-run the rank subplan."""
    from ..caching import scoped_persist
    from .ranks import bucketed_cummax, bucketed_row_number

    valid = df.select(
        F.col(test_col), F.col(p_col).cast("double").alias("p")
    ).filter(F.col("p").isNotNull())
    m = valid.agg(F.count(F.lit(1)).alias("_m"))
    ranked = bucketed_row_number(
        valid,
        "p",
        [F.col("p").asc(), F.col(test_col).asc()],
        "rank",
    ).crossJoin(F.broadcast(m))
    if variant == "by":
        ranked = scoped_persist(ranked)
        c = ranked.agg(
            F.sum(
                F.round(F.lit(1.0) / F.col("rank"), 12).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("_c")
        )
        ranked = ranked.crossJoin(F.broadcast(c))
        q = F.col("p") * F.col("_m") / F.col("rank") * F.col("_c")
        minimum = descending = True
    elif variant == "bh":
        q = F.col("p") * F.col("_m") / F.col("rank")
        minimum = descending = True
    else:  # holm: step-down, max envelope over ranks <= mine
        q = (F.col("_m") - F.col("rank") + F.lit(1)) * F.col("p")
        minimum = descending = False
    env = bucketed_cummax(
        ranked.withColumn("_q", q),
        "rank",
        {"_env": "_q"},
        minimum=minimum,
        descending=descending,
    )
    adj = env.withColumn(
        "p_adj", F.round(F.least(F.col("_env"), F.lit(1.0)), 6)
    )
    return adj.select(
        test_col,
        F.round("p", 6).alias("p"),
        F.col("rank").cast("bigint").alias("rank"),
        "p_adj",
        (F.col("p_adj") <= alpha).alias("reject"),
    )


def fdr_bh(
    df: DataFrame,
    p_col: str,
    test_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction (B&H 1995) over a table of
    per-test p-values: adjusted p = min over j>=rank of p_(j)*m/j (the
    step-up monotone envelope), plus the reject flag at level ``alpha``.
    Shape and NULL-p semantics: :func:`_p_step_adjust`. Returns
    (test, p, rank, p_adj, reject)."""
    return _p_step_adjust(df, p_col, test_col, alpha, "bh")


def fdr_by(
    df: DataFrame,
    p_col: str,
    test_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Yekutieli FDR step-up (B&Y 2001): :func:`fdr_bh` with
    the harmonic correction c(m) = sum_{i=1..m} 1/i — valid under
    ARBITRARY dependence between the tests (correlated segments,
    overlapping windows), at the price of a log(m)-ish factor of
    conservatism. Adjusted p = min over j>=rank of p_(j)*(m/j)*c(m).
    Shape and NULL-p semantics: :func:`_p_step_adjust`."""
    return _p_step_adjust(df, p_col, test_col, alpha, "by")


def holm_bonferroni(
    df: DataFrame,
    p_col: str,
    test_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Holm-Bonferroni step-DOWN FWER correction (Holm 1979): adjusted
    p_(i) = min(1, max_{j<=i} (m-j+1)*p_(j)) — uniformly more powerful
    than plain Bonferroni at the same family-wise error guarantee, no
    independence assumption. The complement of the FDR step-ups: control
    the chance of ANY false positive rather than the false-discovery
    rate. Shape and NULL-p semantics: :func:`_p_step_adjust`."""
    return _p_step_adjust(df, p_col, test_col, alpha, "holm")


def mann_kendall_trend(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Mann–Kendall trend test per series (Mann 1945; Kendall 1975): the
    exact integer S = Σ_{i<j} sign(x_j − x_i), tie-corrected variance,
    and the continuity-corrected z — the non-parametric "is this metric
    trending" test that pairs with theil_sen_slope (MK decides IF,
    Theil–Sen says how fast). Runs on per-key COMPRESSED series (daily
    aggregates), so the pair self-join is bounded by days², never raw
    rows; S and Var(S) are all-integer (DECIMAL-routed at the 100 TB
    design point), only the final z is floating.

    Single-observation series are KEPT (S=0, var_s=0, z=0) — the pairs
    aggregate has no row for them, so the count table left-joins it
    rather than letting an inner join drop the key.

    Returns (key, n_points, s_stat, var_s, z).
    """
    a = df.select(
        F.col(key_col),
        F.col(time_col).alias("_ta"),
        F.col(value_col).cast("double").alias("_xa"),
    )
    b = df.select(
        F.col(key_col),
        F.col(time_col).alias("_tb"),
        F.col(value_col).cast("double").alias("_xb"),
    )
    pairs = a.join(b, key_col).filter(F.col("_ta") < F.col("_tb"))
    s = pairs.groupBy(key_col).agg(
        F.sum(F.signum(F.col("_xb") - F.col("_xa")).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("s_stat")
    )
    n = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    ties = (
        df.groupBy(key_col, F.col(value_col).cast("double").alias("_v"))
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(key_col)
        .agg(
            F.sum(
                F.col("_t").cast("decimal(38,0)")
                * (F.col("_t") - 1)
                * (2 * F.col("_t") + 5)
            ).alias("_tie_term")
        )
    )
    out = (
        # LEFT join from the per-key count table: a series with a single
        # observation has NO i<j pairs, so the S aggregate has no row for
        # it — an inner join would silently drop the key instead of
        # reporting S=0 (z=0, var from the n=1 formula = 0)
        n.join(s, key_col, "left")
        .join(ties, key_col)
        .select(
            F.col(key_col),
            F.col("_n").cast("bigint").alias("n_points"),
            F.coalesce(F.col("s_stat"), F.lit(0)).cast("bigint").alias("s_stat"),
            # numerator exact in DECIMAL, ONE double division (the
            # decimal/decimal scale-6 quantization rule from CLAUDE.md)
            (
                (
                    F.col("_n").cast("decimal(38,0)")
                    * (F.col("_n") - 1)
                    * (2 * F.col("_n") + 5)
                    - F.col("_tie_term")
                ).cast("double")
                / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    z = F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt("var_s")).when(
        F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt("var_s")
    ).otherwise(F.lit(0.0))
    return out.select(
        key_col,
        "n_points",
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


def cliffs_delta(
    df: DataFrame,
    group: Column,
    value: Column,
) -> DataFrame:
    """Cliff's delta ordinal effect size (Cliff 1993): δ = (#(x>y) −
    #(x<y)) / n₁n₂ ∈ [−1, 1] — the magnitude companion to the
    Mann-Whitney z (stats significance says IF, δ says HOW MUCH the
    distributions separate; the nonparametric Cohen's d). With the
    midrank convention δ = 2U₁/n₁n₂ − 1, so it reads off the same
    grouped-value-domain rank identity as :func:`mann_whitney_u` — one
    aggregate + one cumulative window, never an n₁×n₂ pair join.
    Magnitude labels use the Romano et al. (2006) thresholds.
    """
    mw = mann_whitney_u(df, group, value, round_decimals=12)
    d = (
        F.lit(2.0) * F.col("u1") / (F.col("n1").cast("double") * F.col("n2"))
        - 1.0
    )
    mag = (
        F.when(F.abs(d) < 0.147, "negligible")
        .when(F.abs(d) < 0.33, "small")
        .when(F.abs(d) < 0.474, "medium")
        .otherwise("large")
    )
    return mw.select(
        "n1",
        "n2",
        F.round(d, 6).alias("cliffs_delta"),
        mag.alias("magnitude"),
    )


def wilson_lower_bound(
    df: DataFrame,
    pass_col,
    group_cols: Sequence[str],
    z: float = 1.959964,
) -> DataFrame:
    """Per-group binomial pass rate ranked by its Wilson score LOWER bound
    (Wilson 1927) — the small-sample-honest way to rank domains/sources by
    quality: a source with 3/3 passing docs must NOT outrank one with
    960/1000, which the raw rate does and the Wilson lower bound does not.
    The standard tool for "which domains do we keep" decisions over a
    crawl, where per-domain counts span 1 to millions.

        lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)

    Shape: ONE count/sum aggregate per group then pure scalar math — the
    group cardinality (#domains) is the output bound, so the whole thing
    is a map-side-combined shuffle regardless of corpus size. ``pass_col``
    is any boolean Column; counts are exact BIGINTs and the float math is
    a fixed expression tree, so results are engine-exact under round(6).

    NULL pass flags propagate: a group whose ``pass_col`` is entirely NULL
    gets NULL ``n_pass``/``pass_rate``/``wilson_lb`` (SQL sum-of-NULLs
    semantics, matching the DuckDB oracle). Callers ranking by the bound
    should either treat NULL as fail upstream
    (``coalesce(pass_col, false)``) or expect NULL bounds to sort with
    their engine's NULL ordering."""
    p = F.col("_pass").cast("double") / F.col("n_docs").cast("double")
    n = F.col("n_docs").cast("double")
    z2 = F.lit(float(z) * float(z))
    lb = (
        p
        + z2 / (F.lit(2.0) * n)
        - F.lit(float(z))
        * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n)
    ) / (F.lit(1.0) + z2 / n)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(pass_col.cast("bigint")).cast("bigint").alias("_pass"),
    )
    return agg.select(
        *group_cols,
        "n_docs",
        F.col("_pass").alias("n_pass"),
        F.round(p, 6).alias("pass_rate"),
        F.round(lb, 6).alias("wilson_lb"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    stronger companion to :func:`k_anonymity`: a quasi-identifier group
    can be large (k-anonymous) yet still leak its members' sensitive
    attribute when almost every row in it shares one value. Reports
    every group whose sensitive column shows FEWER than ``l`` distinct
    values, with both diversity readouts:

    - ``distinct_l`` — distinct sensitive values in the group (plain
      l-diversity);
    - ``entropy_l`` — exp(H) of the group's sensitive-value distribution
      (entropy l-diversity: effective number of values; punishes a
      99%/1% split that plain distinctness scores as 2).

    One grouped pass at (quasi, sensitive) grain feeding one group-grain
    aggregate — both map-side combined; output is bounded by the
    violation set. NULL sensitive values count as one distinct value
    (they ARE a disclosure: "this group's salary is unknown" is itself
    informative), via a sentinel coalesce."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    sv = F.coalesce(F.col(sensitive_col).cast("string"), F.lit("\x00null"))
    cell = df.groupBy(*quasi_cols, sv.alias("_sv")).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    tot = F.sum("_n")
    # H = ln(N) − Σ n·ln(n) / N (one pass; no per-row p=n/N division).
    # The Σ n·ln(n) terms are rounded then DECIMAL-summed so the result
    # is independent of summation order — the cross-engine float rule
    # (CLAUDE.md): a plain double sum hashes differently per scan order.
    nlogn = F.sum(
        F.round(F.col("_n") * F.log("_n"), 6).cast("decimal(28,6)")
    ).cast("double")
    return (
        cell.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("distinct_l"),
            F.sum("_n").cast("bigint").alias("n_rows"),
            F.round(F.exp(F.log(tot) - nlogn / tot), 6).alias("entropy_l"),
        )
        .filter(F.col("distinct_l") < l)
    )


def cramers_v(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cramér's V association between two categorical columns, with the
    Bergsma (2013) bias correction — the effect-size readout a chi-square
    statistic alone doesn't give (chi² grows with n; V is comparable
    across tables). The profiling use: rank column PAIRS by association
    strength when hunting redundant or leaking features.

    One pass to the contingency cells (map-side combined), then
    cell-grain arithmetic against broadcast 1-row margins — no row-level
    rework, output is ONE row. NULLs form their own category (a missing
    value can carry association). Expected counts and chi² are exact
    DECIMAL→DOUBLE math at cell grain; r, c, n ride the same pass.

    Returns (n_rows, n_levels_a, n_levels_b, chi2, cramers_v,
    cramers_v_corrected)."""
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("\x00null"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("\x00null"))
    cells = df.groupBy(a.alias("_a"), b.alias("_b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    row_m = cells.groupBy("_a").agg(F.sum("_n").alias("_na"))
    col_m = cells.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    tot = cells.agg(
        F.sum("_n").cast("bigint").alias("_N"),
        F.count_distinct("_a").cast("bigint").alias("_r"),
        F.count_distinct("_b").cast("bigint").alias("_c"),
    )
    # chi² = N·(Σ o²/(na·nb) − 1): one cell-grain sum, margins joined by
    # key (broadcast-sized: |levels| rows), N as a broadcast cross join
    # per-cell terms o²/(na·nb) ∈ (0,1] are rounded then DECIMAL-summed:
    # order-independent across engines (the ts_acf oracle pattern)
    cell_sum = (
        cells.join(row_m, "_a")
        .join(col_m, "_b")
        .agg(
            F.sum(
                F.round(
                    (F.col("_n").cast("double") * F.col("_n").cast("double"))
                    / (F.col("_na").cast("double") * F.col("_nb").cast("double")),
                    12,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("_s")
        )
    )
    n, r, c = (F.col("_N").cast("double"), F.col("_r").cast("double"), F.col("_c").cast("double"))
    # clamp at zero: on an exactly-independent table the rounded-term
    # DECIMAL sum can land a hair BELOW 1 (e.g. 1/9 → 0.111111111111 ×9
    # = 0.999999999999), and sqrt(−ε) is NaN — which Spark then sorts
    # ABOVE every number (CLAUDE.md rolling_zscore rule); chi2 gets the
    # same clamp so it can't print −0.0
    phi2 = F.greatest(F.lit(0.0), F.col("_s") - F.lit(1.0))  # chi²/N
    chi2 = n * phi2
    # Bergsma bias correction: phi2~ = max(0, phi2 − (r−1)(c−1)/(N−1)),
    # r~ = r − (r−1)²/(N−1), c~ = c − (c−1)²/(N−1)
    phi2c = F.greatest(
        F.lit(0.0), phi2 - (r - 1) * (c - 1) / F.nullif(n - 1, F.lit(0.0))
    )
    rc = r - (r - 1) * (r - 1) / F.nullif(n - 1, F.lit(0.0))
    cc = c - (c - 1) * (c - 1) / F.nullif(n - 1, F.lit(0.0))
    return (
        cell_sum.join(F.broadcast(tot))
        .select(
            F.col("_N").alias("n_rows"),
            F.col("_r").alias("n_levels_a"),
            F.col("_c").alias("n_levels_b"),
            F.round(chi2, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    phi2
                    / F.nullif(F.least(r - 1, c - 1), F.lit(0.0))
                ),
                6,
            ).alias("cramers_v"),
            F.round(
                F.sqrt(
                    phi2c
                    / F.nullif(F.least(rc - 1, cc - 1), F.lit(0.0))
                ),
                6,
            ).alias("cramers_v_corrected"),
        )
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float = 0.2,
    ordered: bool = True,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third rung of the privacy ladder after :func:`k_anonymity` and
    :func:`l_diversity`: a group can be large AND diverse yet still leak
    when its sensitive-value DISTRIBUTION deviates from the global one
    (e.g. one zip code skewing heavily to a rare diagnosis). Distance is
    the ordered-attribute Earth Mover's Distance of the paper:
    EMD = Σ_i |Σ_{j≤i} (p_j − q_j)| / (m−1) over the m globally-observed
    sensitive values in sort order, p the group's distribution and q the
    global one (values absent from a group contribute p_j = 0 via the
    group×value grid).

    ``ordered=True`` (the default) ASSUMES the sensitive attribute is
    ORDINAL under its string sort order — the cumulative EMD walks the
    values lexicographically, so for a purely categorical domain the
    reported distance depends on label spelling (renaming 'a'→'z'
    changes it). For categorical attributes pass ``ordered=False`` to
    get the paper's equal-distance EMD, 0.5·Σ|p_j − q_j| (total
    variation distance) — label-permutation invariant, no cumulative
    window at all.

    Scale shape: one count pass at (quasi, sensitive) grain, one at
    value grain (both map-side combined); the grid is |groups|·m rows —
    m is the sensitive domain, small by the audit's nature — and the
    cumulative window runs over m rows per group. Cumulative sums fold
    in declared value order, so the doubles are engine-identical; the
    final EMD rounds to 6.

    Returns one row per group: (quasi…, n_rows, emd, violates_t) —
    every group reported, flag rather than filter, because the audit's
    deliverable is the full closeness profile."""
    qs = list(quasi_cols)
    sv = F.coalesce(F.col(sensitive_col).cast("string"), F.lit("\x00null"))
    cells = df.groupBy(*qs, sv.alias("_sv")).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    gtot = cells.groupBy(*qs).agg(F.sum("_n").alias("_g"))
    vals = cells.groupBy("_sv").agg(F.sum("_n").alias("_nv"))
    m_tot = vals.agg(
        F.sum("_nv").alias("_N"), F.count(F.lit(1)).cast("int").alias("_m")
    )
    # group × value grid so absent values carry p = 0 (cell counts are
    # renamed before the join back — gtot/vals share cells' lineage, so
    # a bare `_n` is ambiguous to the analyzer)
    cells_r = cells.select(*qs, "_sv", F.col("_n").alias("_cn"))
    grid = (
        gtot.crossJoin(F.broadcast(vals))
        .join(cells_r, qs + ["_sv"], "left")
        .join(F.broadcast(m_tot))
        .select(
            *qs,
            "_sv",
            "_g",
            "_m",
            (
                F.coalesce(F.col("_cn"), F.lit(0.0)) / F.col("_g")
                - F.col("_nv") / F.col("_N")
            ).alias("_d"),
        )
    )
    if not ordered:
        # categorical (equal-distance) EMD: 0.5 · Σ|p − q| — the same
        # round-then-DECIMAL-sum discipline as the ordered branch, no
        # window, label-permutation invariant
        return (
            grid.groupBy(*qs)
            .agg(
                F.max("_g").cast("bigint").alias("n_rows"),
                F.round(
                    F.sum(
                        F.round(F.abs("_d"), 9).cast("decimal(38,9)")
                    ).cast("double")
                    * 0.5,
                    6,
                ).alias("emd"),
            )
            .withColumn(
                "violates_t", (F.col("emd") > F.lit(float(t))).cast("int")
            )
        )

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*qs)
        .orderBy("_sv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("_cum", F.sum("_d").over(w))
    return (
        cum.groupBy(*qs)
        .agg(
            F.max("_g").cast("bigint").alias("n_rows"),
            # |cum| terms round-then-DECIMAL-sum: order-independent
            # across engines (the cell-term rule above). m = 1 (a
            # single-valued sensitive domain) makes the normalizer NULL;
            # every group then equals the global distribution, so the
            # DEFINED answer is emd = 0 — coalesce, matching the
            # oracle's CASE WHEN flag semantics
            F.coalesce(
                F.round(
                    F.sum(
                        F.round(F.abs("_cum"), 9).cast("decimal(38,9)")
                    ).cast("double")
                    / F.nullif(F.max("_m").cast("double") - 1.0, F.lit(0.0)),
                    6,
                ),
                F.lit(0.0),
            ).alias("emd"),
        )
        .withColumn(
            "violates_t", (F.col("emd") > F.lit(float(t))).cast("int")
        )
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Brown–Forsythe variance-homogeneity test (the median-centered
    Levene 1960 variant, Brown & Forsythe 1974): one-way ANOVA applied
    to z = |x − median_g| — "do the groups differ in SPREAD", the
    assumption check behind trusting :func:`anova_oneway`'s pooled
    within-group variance and behind any per-segment volatility claim.
    Median centering (not mean) keeps the test robust to heavy tails.

    One exact per-group median pass (percentile 0.5, linear
    interpolation — engine-identical on the 6-decimal-quantized
    values), a broadcast-sized join of the k medians back onto the
    stream, then the whole :func:`anova_oneway` machinery reused on the
    quantized |deviations| — same output contract (the F statistic IS
    Brown–Forsythe's W)."""
    g = df.select(
        F.col(group_col).alias("_g"),
        F.round(F.col(value_col).cast("double"), 6).alias("_v"),
    ).filter(
        # NaN would skew the median (Spark sorts NaN above all numbers)
        # and then throw in anova_oneway's ANSI decimal casts
        F.col("_g").isNotNull() & F.col("_v").isNotNull() & ~F.isnan("_v")
    )
    med = g.groupBy("_g").agg(F.percentile("_v", 0.5).alias("_med"))
    z = g.join(F.broadcast(med), "_g").select(
        "_g", F.round(F.abs(F.col("_v") - F.col("_med")), 6).alias("_z")
    )
    return anova_oneway(z, "_g", "_z")


def wilcoxon_signed_rank(
    df: DataFrame,
    diff_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Wilcoxon signed-rank test over PAIRED differences — the matched
    companion to :func:`mann_whitney_u` (same subject under two
    conditions: before/after, variant A/B on the same user). Input is
    one row per pair carrying the difference; zeros are dropped and
    |d| ties take midranks, both per the standard treatment.

    Same scale shape as mann_whitney_u / auc_roc: one aggregate to the
    distinct |d| grain, bucket-parallel cumulative counts
    (``ranks.bucketed_cumsum`` — no single-partition window), then the
    doubled-midrank identity 2·W⁺ = Σ n₊(v)·(2·cum(<v) + n(v) + 1) in
    exact DECIMAL integers; .5-midranks only materialize in the final
    halving. z uses the tie-corrected variance n(n+1)(2n+1)/24 −
    Σ(t³−t)/48 (no continuity correction); only z's final division is
    floating. ``round_decimals`` sets BOTH the input quantization grain
    (zero-drop and |d| ties) and the output rounding — sub-grain
    differences round to zero and drop, so callers with finer data
    raise it rather than silently losing pairs. NULL and NaN
    differences are excluded (NaN passes ``!= 0`` and sorts above every
    finite |d| under Spark's ordering — the weighted-reservoir hazard).
    Returns one row (n_pairs, w_plus, w_minus, z)."""
    from .ranks import bucketed_cumsum

    d = df.select(
        F.round(F.col(diff_col).cast("double"), round_decimals).alias("_d")
    ).filter(
        F.col("_d").isNotNull() & ~F.isnan("_d") & (F.col("_d") != 0)
    )
    per = d.groupBy(F.abs(F.col("_d")).alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_nt"),
        F.sum(F.when(F.col("_d") > 0, 1).otherwise(0)).cast("long").alias("_np"),
    )
    cum = bucketed_cumsum(per, "_v", {"_c": F.col("_nt")})
    dec = "decimal(19,0)"
    t = F.col("_nt").cast(dec)
    two_wp = F.sum(
        F.col("_np").cast(dec)
        * (F.lit(2).cast(dec) * F.col("_c").cast(dec) + t + 1)
    )
    agg = cum.agg(
        F.sum("_nt").cast("long").alias("n_pairs"),
        two_wp.alias("_2wp"),
        F.sum(t * t * t - t).cast("double").alias("_ties"),
    )
    n = F.col("n_pairs").cast("double")
    wp = F.col("_2wp").cast("double") / 2.0
    wm = n * (n + 1) / 2.0 - wp
    var = n * (n + 1) * (2 * n + 1) / 24.0 - F.col("_ties") / 48.0
    z = (wp - n * (n + 1) / 4.0) / F.sqrt(F.nullif(var, F.lit(0.0)))
    return agg.select(
        "n_pairs",
        F.round(wp, round_decimals).alias("w_plus"),
        F.round(wm, round_decimals).alias("w_minus"),
        F.round(z, round_decimals).alias("z"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman test (1937) — the k-treatment PAIRED rank test that
    completes the nonparametric quartet (:func:`mann_whitney_u` for two
    independent samples, :func:`wilcoxon_signed_rank` for two paired,
    :func:`kruskal_wallis` for k independent, this for k paired): every
    BLOCK (subject) ranks the k treatments among themselves, so
    between-subject level differences cancel entirely — "does treatment
    order hold up across subjects", the repeated-measures question.

    Only blocks observing ALL k treatments enter (an incomplete block
    cannot rank the full set). Within-block ties take midranks; the
    statistic uses the tie-corrected form
    χ² = (k−1)·Σ_j (R_j − n(k+1)/2)² / (Σ r² − n·k(k+1)²/4)
    over the per-block midranks r and rank SUMS R_j — equivalently
    (k−1)·n²·Σ_j (R̄_j − (k+1)/2)² / (same denominator) on rank MEANS,
    which is what the code computes — reducing to the classic
    12/(nk(k+1))·ΣR_j² − 3n(k+1) when tie-free. Under H₀, χ²(k−1).

    Scale shape: one (block, treatment) mean aggregate (map-side
    combined, 6-decimal-quantized DECIMAL sums), a within-block midrank
    window (k rows per partition — never a global sort), then one
    treatment-grain and one final aggregate; rank sums and squared-rank
    sums round-then-DECIMAL so the statistic is summation-order
    independent. Returns one row (n_blocks, k_treatments, chi2, df)."""
    from pyspark.sql import Window

    cell = (
        df.select(
            F.col(block_col).alias("_b"),
            F.col(treatment_col).alias("_t"),
            F.round(F.col(value_col).cast("double"), 6).alias("_v"),
        )
        .filter(
            F.col("_b").isNotNull()
            & F.col("_t").isNotNull()
            & F.col("_v").isNotNull()
            & ~F.isnan("_v")  # same NaN hazard as brown_forsythe
        )
        .groupBy("_b", "_t")
        .agg(
            (
                F.sum(F.col("_v").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_m")
        )
    )
    # k = global treatment count; complete blocks only (in-plan, no collect)
    k_row = cell.select("_t").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_k")
    )
    sizes = cell.groupBy("_b").agg(F.count(F.lit(1)).alias("_nb"))
    complete = (
        cell.join(sizes, "_b")
        .join(F.broadcast(k_row))
        .filter(F.col("_nb") == F.col("_k"))
    )
    # within-block midrank: rank + (ties−1)/2, all inside a k-row window
    w = Window.partitionBy("_b").orderBy("_m")
    ranked = complete.withColumn(
        "_r",
        F.rank().over(w).cast("double")
        + (F.count(F.lit(1)).over(
            Window.partitionBy("_b", "_m")
        ).cast("double") - 1.0) / 2.0,
    )
    per_t = ranked.groupBy("_t").agg(
        F.sum(F.round(F.col("_r"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("_R"),
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.max("_k").alias("_k"),
    )
    sq = ranked.agg(
        F.sum(F.round(F.col("_r") * F.col("_r"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("_sq")
    )
    agg = per_t.agg(
        F.max("_n").alias("n_blocks"),
        F.max("_k").alias("k_treatments"),
        F.sum(
            F.round(
                (F.col("_R") / F.col("_n") - (F.col("_k") + 1.0) / 2.0)
                * (F.col("_R") / F.col("_n") - (F.col("_k") + 1.0) / 2.0),
                9,
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("_dev2"),
    ).join(F.broadcast(sq))
    n = F.col("n_blocks").cast("double")
    k = F.col("k_treatments").cast("double")
    denom = F.col("_sq") - n * k * (k + 1.0) * (k + 1.0) / 4.0
    chi2 = (k - 1.0) * (n * F.col("_dev2")) * n / F.nullif(denom, F.lit(0.0))
    return agg.select(
        "n_blocks",
        "k_treatments",
        F.round(chi2, 6).alias("chi2"),
        (F.col("k_treatments") - 1).cast("long").alias("df"),
    )


def cochran_q(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    success_col: str,
) -> DataFrame:
    """Cochran's Q test (1950) — the k-paired-BINARY sibling of
    :func:`friedman_test` (and the k-treatment generalization of
    McNemar): do the k treatments' success RATES differ when every
    block (subject) experiences all k? Input is one row per
    (block, treatment) carrying a 0/1 (or boolean) success flag;
    incomplete blocks are excluded like Friedman's.

    Computed via the all-integer identity
    Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)
    with C_j the treatment success totals, R_i the block totals, N the
    grand total — numerator and denominator stay exact DECIMAL
    integers, one final double division (χ²(k−1) under H₀; NULL when
    every block is constant, which zeroes the denominator).

    Scale shape: the (block, treatment) grain IS the input; one block
    aggregate (map-side combined) for sizes and R_i, one treatment
    aggregate for C_j, two 1-row reductions — no windows at all.
    Returns one row (n_blocks, k_treatments, q_stat, df)."""
    cell = df.select(
        F.col(block_col).alias("_b"),
        F.col(treatment_col).alias("_t"),
        F.col(success_col).cast("int").alias("_x"),
    ).filter(
        F.col("_b").isNotNull() & F.col("_t").isNotNull() & F.col("_x").isNotNull()
    )
    k_row = cell.select("_t").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_k")
    )
    # completeness = exactly one row per (block, treatment) cell:
    # count == countDistinct == k. A bare row-count == k would let a
    # duplicated (block, treatment) pair mask a missing treatment and
    # double-count into R_i / C_j.
    per_b = cell.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_nb"),
        F.countDistinct("_t").alias("_ndt"),
        F.sum("_x").alias("_r"),
    )
    complete = (
        cell.join(per_b, "_b")
        .join(F.broadcast(k_row))
        .filter((F.col("_nb") == F.col("_k")) & (F.col("_ndt") == F.col("_k")))
    )
    dec = "decimal(38,0)"
    rows = complete.groupBy("_b").agg(
        F.max("_r").cast(dec).alias("_r"), F.max("_k").alias("_k")
    )
    r_agg = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.max("_k").alias("_k"),
        F.sum(F.col("_r") * F.col("_r")).alias("_sr2"),
        F.sum("_r").cast(dec).alias("_N"),
    )
    cols = complete.groupBy("_t").agg(F.sum("_x").cast(dec).alias("_c"))
    c_agg = cols.agg(F.sum(F.col("_c") * F.col("_c")).alias("_sc2"))
    agg = r_agg.join(F.broadcast(c_agg))
    k = F.col("_k").cast(dec)
    num = (k - 1) * (k * F.col("_sc2") - F.col("_N") * F.col("_N"))
    den = k * F.col("_N") - F.col("_sr2")
    return agg.select(
        "n_blocks",
        F.col("_k").alias("k_treatments"),
        F.round(
            num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), 6
        ).alias("q_stat"),
        (F.col("_k") - 1).cast("long").alias("df"),
    )
