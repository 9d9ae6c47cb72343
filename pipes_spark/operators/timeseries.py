"""Time-series operators: dense-grid gap filling, forward fill, linear
interpolation, and ordered funnel analysis.

In the reference these would be hand-written per-element state inside a
``MiddleFunc`` (ref: pipe/node.go:16-19) — a rolling "last seen value" per
key is exactly the stateful-middle pattern.  Here each is a declarative
DataFrame composition so Catalyst plans the shuffles.

Scale (100 TB design points):

* The gap-fill grid is generated per key with a **two-level**
  sequence+explode: coarse segment starts first, then at most ``chunk``
  buckets per segment row — no single row ever materializes an unbounded
  array (a year of 1-second buckets is ~31.5M elements; one flat
  ``sequence`` would build it as ONE in-memory array per key and trip
  Spark's ~2^31 sequence cap).  Parallelism is across key×segment, so a
  single key's long span spreads over many rows and tasks.
* Forward fill / interpolation are single-window passes: ONE shuffle on the
  key, then sorted within partitions. Interpolation needs no self-join —
  the "previous/next non-null" pairs come from the same sorted run via
  ``last(..., ignorenulls)`` over mirrored frames.
* Funnel shuffles the (filtered) event table ONCE into per-(user, step)
  sorted timestamp arrays; the step sequencing is then ``len(steps) - 1``
  join+project rounds over those small per-user aggregates — the raw event
  table is never re-scanned or self-joined per step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OrderCols = Union[str, Sequence[str]]


def _order_list(order_cols: OrderCols) -> list[str]:
    return [order_cols] if isinstance(order_cols, str) else list(order_cols)


def gapfill(
    df: DataFrame,
    keys: Sequence[str],
    bucket_col: str,
    step: str,
    value_cols: Sequence[str],
    chunk: int = 1024,
) -> DataFrame:
    """Densify a per-key bucketed series: emit one row per ``step`` between
    each key's min and max bucket; buckets absent from ``df`` carry NULL in
    every value column.

    ``step`` is an INTERVAL literal body, e.g. ``"1 hour"``. ``bucket_col``
    must be a timestamp already truncated to the grain (the function fills
    between observed buckets; it does not re-bucket).

    The grid is built in two explode levels so no row holds more than
    ``chunk`` buckets: segment starts at ``chunk * step`` spacing, then the
    per-segment buckets. A key spanning a year at 1-second grain becomes
    ~31k segment rows of ≤1024 buckets instead of one 31.5M-element array.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    seg_step = F.expr(f"interval {step} * {chunk}")
    last_in_seg = F.expr(f"interval {step} * {chunk - 1}")
    spans = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    segments = spans.select(
        *keys,
        F.col("_mx"),
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"), seg_step)).alias("_seg"),
    )
    grid = segments.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("_seg"),
                F.least(F.col("_seg") + last_in_seg, F.col("_mx")),
                F.expr(f"interval {step}"),
            )
        ).alias(bucket_col),
    )
    return grid.join(
        df.select(*keys, bucket_col, *value_cols), [*keys, bucket_col], "left"
    )


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: OrderCols,
    cols: Sequence[str],
    suffix: str = "_ffill",
) -> DataFrame:
    """Carry the last non-null value forward within each key, ordered by
    ``order_cols`` (pass a tiebreak column when the primary order can tie —
    ties make "last" nondeterministic).  One window pass (shuffle on keys,
    sort within)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*_order_list(order_cols))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns(
        {c + suffix: F.last(c, ignorenulls=True).over(w) for c in cols}
    )


def linear_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: OrderCols,
    value_col: str,
    ts_col: Optional[str] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Fill NULL gaps in ``value_col`` by linear interpolation between the
    nearest non-null neighbours (in event time) within each key.

    ``ts_col`` is the timestamp driving the interpolation weights; it
    defaults to the first of ``order_cols``. Leading/trailing gaps (no
    neighbour on one side) stay NULL — the same contract as pandas
    ``interpolate(limit_area="inside")``.

    Single shuffle: both the previous and the next non-null (value, time)
    pairs come from one sorted window partition, using ``last(ignorenulls)``
    over the preceding frame and its mirror over the following frame
    (``first(ignorenulls)``).  Time math is done on microsecond epochs so
    sub-second grids interpolate exactly.
    """
    order = _order_list(order_cols)
    ts_col = ts_col or order[0]
    out_col = out_col or value_col + "_interp"
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    wp = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(*keys)
        .orderBy(*order)
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

    Returns one row per user who completed step 1, keyed by ``user_col``,
    with columns ``t1..tN`` (NULL once the funnel breaks) and ``depth``
    (number of consecutive steps completed).

    Plan: the raw event table is filtered to funnel steps and shuffled
    ONCE into per-(user, step) sorted timestamp arrays; the left-fold
    "min ts at-or-after the previous step" then runs as ``len(steps) - 1``
    join+project rounds over those small per-user aggregates (array min
    over a filtered sorted array per row) — never a per-step self-join or
    re-scan of the raw events. Per-(user, step) event counts bound the
    array sizes; a user with millions of same-step events would need a
    count-limited pre-aggregation first.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_etype"),
    )
    per_step = ev.groupBy("_u", "_etype").agg(
        F.array_sort(F.collect_list("_ts")).alias("_tss")
    )
    cur = (
        per_step.filter(F.col("_etype") == steps[0])
        .select("_u", F.element_at("_tss", 1).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            per_step.filter(F.col("_etype") == step)
            .join(cur.select("_u", F.col(f"t{i-1}").alias("_prev")), "_u")
            .select(
                "_u",
                F.array_min(
                    F.filter("_tss", lambda t: t >= F.col("_prev"))
                ).alias(f"t{i}"),
            )
        )
        cur = cur.join(nxt, "_u", "left")
    depth = sum(
        (F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0))
        for i in range(1, len(steps) + 1)
    )
    return cur.withColumnRenamed("_u", user_col).withColumn(
        "depth", depth.cast("bigint")
    )


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


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: OrderCols,
    value_col: str,
    alpha: float = 0.3,
    span: int = 12,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Exponentially-weighted moving average with a bounded memory horizon.

    The textbook EWMA is the recursion ``y_i = α·x_i + (1-α)·y_{i-1}`` —
    inherently sequential, which in the reference would be per-element state
    in a ``MiddleFunc`` (ref: pipe/node.go:16-19). Here it is the
    finite-impulse form over the last ``span+1`` observations:
    ``y_i = Σ_{d=0..span} (1-α)^d · x_{i-d} / Σ (1-α)^d`` (weights
    renormalized over the rows that exist, so warm-up rows average over a
    shorter tail — pandas ``ewm(adjust=True)`` semantics truncated at
    ``span``). With α=0.3, span=12 the dropped tail weight is
    (1-α)^13 ≈ 0.97% — bounded truncation error in exchange for a plan that
    is ONE window shuffle and a flat codegen lag chain: no recursion, no
    self-join, no per-key sequential scan, and any engine that evaluates the
    same left-to-right chain reproduces it bit-for-bit (the SQL oracle
    does exactly that).

    Scale: single shuffle on ``keys``; ``span`` lag frames over one sorted
    run; expression tree is ~4·span nodes — far under the JIT ceiling.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if span < 0:
        raise ValueError(f"span must be >= 0, got {span}")
    out_col = out_col or value_col + "_ewma"
    w = Window.partitionBy(*keys).orderBy(*_order_list(order_cols))
    v = F.col(value_col)
    num = v  # d = 0 term: weight 1
    den = F.when(v.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    for d in range(1, span + 1):
        lagged = F.lag(v, d).over(w)
        weight = float((1.0 - alpha) ** d)
        num = num + F.coalesce(lagged * weight, F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.round(num / den, 6))


def ewma_sql(
    keys: Sequence[str],
    order_exprs: Sequence[str],
    value_expr: str,
    alpha: float = 0.3,
    span: int = 12,
) -> str:
    """DuckDB twin of :func:`ewma`'s output expression — the identical
    left-to-right chain, so float results match bit-for-bit before the
    shared round(…, 6)."""
    over = f"OVER (PARTITION BY {', '.join(keys)} ORDER BY {', '.join(order_exprs)})"
    num = value_expr
    den = f"(CASE WHEN {value_expr} IS NOT NULL THEN 1.0 ELSE 0.0 END)"
    for d in range(1, span + 1):
        lagged = f"lag({value_expr}, {d}) {over}"
        weight = repr(float((1.0 - alpha) ** d))
        num = f"({num} + coalesce({lagged} * {weight}, 0.0))"
        den = f"({den} + (CASE WHEN {lagged} IS NOT NULL THEN {weight} ELSE 0.0 END))"
    return f"round({num} / {den}, 6)"


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: OrderCols,
    value_col: str,
    lookback: int = 50,
    min_periods: int = 10,
) -> DataFrame:
    """Rolling z-score of each observation against the PRECEDING ``lookback``
    rows in its key (never including itself — the streaming-anomaly framing:
    score the new point against history only).

    Adds ``roll_avg``, ``roll_std`` (sample std), and ``zscore`` (NULL until
    ``min_periods`` history rows exist or when the window is constant).

    Mean and variance come from decimal ``Σx`` / ``Σx²`` over the frame —
    exact and order-independent, so results are engine-portable (float
    window aggregates differ across engines in summation order; DECIMAL
    does not). One shuffle on ``keys``, one sorted window pass.
    """
    if lookback < 1 or min_periods < 1:
        raise ValueError(
            f"lookback and min_periods must be >= 1, got {lookback}, {min_periods}"
        )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*_order_list(order_cols))
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    # nullif guards: ANSI mode (Spark 4 default) THROWS on /0, and the
    # empty/singleton history rows hit n = 0 and n − 1 = 0
    mean_div = F.nullif(n, F.lit(0))
    var_div = F.nullif(n - 1, F.lit(0))
    sx = F.sum(v.cast("decimal(28,6)")).over(w).cast("double")
    sxx = F.sum((v * v).cast("decimal(28,6)")).over(w).cast("double")
    mean = sx / mean_div
    # clamp at 0: float cancellation in sxx − sx²/n can dip a true-zero
    # variance epsilon-negative; gate on var (finite) rather than the std —
    # sqrt(negative) is NaN and Spark orders NaN ABOVE every number, so a
    # `std > 0` gate would silently pass
    var = F.greatest((sxx - sx * sx / mean_div) / var_div, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(
        (n >= min_periods) & (var > 0), F.round((v - mean) / std, 6)
    )
    return (
        df.withColumn("roll_avg", F.round(mean, 6))
        .withColumn("roll_std", F.round(std, 6))
        .withColumn("zscore", z)
    )


def zscore_outliers(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: OrderCols,
    value_col: str,
    threshold: float = 3.0,
    lookback: int = 50,
    min_periods: int = 10,
) -> DataFrame:
    """Rows whose value deviates ≥ ``threshold`` sample standard deviations
    from their own trailing window — the anomaly-detection filter over
    :func:`rolling_zscore`."""
    scored = rolling_zscore(df, keys, order_cols, value_col, lookback, min_periods)
    return scored.filter(F.abs(F.col("zscore")) >= threshold)


def rolling_zscore_bucketed(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: OrderCols,
    value_col: str,
    lookback: int = 50,
    min_periods: int = 10,
    ts_col: Optional[str] = None,
    bucket: str = "day",
) -> DataFrame:
    """EXACTLY :func:`rolling_zscore`, reformulated so a hot key scales.

    ``rolling_zscore`` partitions the window by ``keys`` — for a
    low-cardinality key (e.g. 5 event types over 100 TB) that is one task
    sorting one key's entire history. This variant exploits the BOUNDED
    frame (``lookback`` preceding rows): a row deeper than ``lookback``
    into its (key, time-bucket) has its whole frame inside the bucket, so
    pass 1 computes it with windows partitioned by (key, bucket) —
    parallelism = keys × buckets. Only each bucket's first ``lookback``
    rows ("heads") need cross-bucket history, and that history can only
    come from some bucket's last ``lookback`` rows ("tails"); pass 2 runs
    the same window over the union of heads+tails per key — a table of at
    most keys × buckets × 2·lookback rows, thousands of times smaller than
    the data — and keeps the head scores. Union of the two passes equals
    the global formulation row-for-row (the oracle hash-checks this
    equivalence).

    The frame material in pass 2 is exact, not approximate: every true
    preceding-``lookback`` row of a head row is either a head of the same
    bucket or within the tail of an earlier bucket, and pass-2 rows keep
    their global order, so "lookback preceding in the union" selects
    precisely the true frame.
    """
    order = _order_list(order_cols)
    ts_col = ts_col or order[0]
    base = df.withColumn("_bkt", F.date_trunc(bucket, F.col(ts_col).cast("timestamp")))
    wb = Window.partitionBy(*keys, "_bkt").orderBy(*order)
    cntw = Window.partitionBy(*keys, "_bkt")
    base = (
        base.withColumn("_rn", F.row_number().over(wb))
        .withColumn("_cnt", F.count(F.lit(1)).over(cntw))
    )

    # pass 1 windows over the FULL bucket (heads included — an interior
    # row's frame reaches back into them) but keeps only interior scores:
    # a row with _rn > lookback has its whole frame in-bucket, so its
    # in-bucket score equals the global one. Heads get truncated frames
    # here; they are dropped and re-scored exactly in pass 2.
    scored_interior = rolling_zscore(
        base, [*keys, "_bkt"], order, value_col, lookback, min_periods
    ).filter(F.col("_rn") > lookback)

    boundary = base.filter(
        (F.col("_rn") <= lookback) | (F.col("_cnt") - F.col("_rn") < lookback)
    )
    scored_heads = rolling_zscore(
        boundary.drop("_cnt"), keys, order, value_col, lookback, min_periods
    ).filter(F.col("_rn") <= lookback)

    out_cols = [*df.columns, "roll_avg", "roll_std", "zscore"]
    return scored_interior.select(*out_cols).unionByName(
        scored_heads.select(*out_cols)
    )


def zscore_outliers_bucketed(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: OrderCols,
    value_col: str,
    threshold: float = 3.0,
    lookback: int = 50,
    min_periods: int = 10,
    ts_col: Optional[str] = None,
    bucket: str = "day",
) -> DataFrame:
    """Outlier filter over :func:`rolling_zscore_bucketed` — the hot-key
    scale form of :func:`zscore_outliers`."""
    scored = rolling_zscore_bucketed(
        df, keys, order_cols, value_col, lookback, min_periods, ts_col, bucket
    )
    return scored.filter(F.abs(F.col("zscore")) >= threshold)


def forecast_linear(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    step: str = "1 day",
    min_points: int = 3,
) -> DataFrame:
    """Per-key linear-trend forecast: closed-form OLS of value over time
    (``profiling.linear_fit`` — exact DECIMAL sufficient statistics, one
    groupBy shuffle), extrapolated ``horizon`` steps past each key's last
    observation. The simplest member of the forecasting family — the
    deterministic, SQL-expressible baseline every fancier model is judged
    against.

    Output: one row per key per future step with ``ts`` and ``yhat``
    (NULL for keys below ``min_points`` or with zero time-variance). The
    horizon grid is a per-key ``sequence`` + explode (bounded by
    ``horizon``) — map-side against the tiny per-key fit table."""
    from .profiling import linear_fit

    base = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    x = (F.unix_micros(F.col(ts_col)) - base) / F.lit(1000000.0)
    # 12-decimal fit: per-second slopes are ~1e-5, and the horizon
    # multiplies slope error by ~1e6 seconds — 6 decimals would visibly
    # bend the forecast. Cross-engine exactness needs only IDENTICAL
    # rounding, not coarse rounding.
    fits = linear_fit(
        df.select(*keys, ts_col, value_col), keys, x, F.col(value_col), min_points,
        round_decimals=12,
    )
    last = df.groupBy(*keys).agg(F.max(ts_col).alias("_last_ts"))
    grid = (
        fits.join(last, list(keys))
        .select(
            *keys,
            "slope",
            "intercept",
            F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("_h"),
            F.col("_last_ts"),
        )
        .withColumn("ts", F.expr(f"_last_ts + _h * interval {step}"))
    )
    xf = (F.unix_micros(F.col("ts")) - base) / F.lit(1000000.0)
    return grid.select(
        *keys,
        F.col("_h").cast("bigint").alias("step_ahead"),
        "ts",
        F.round(F.col("slope") * xf + F.col("intercept"), 6).alias("yhat"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: Optional[str] = None,
) -> DataFrame:
    """Time-weighted average per key — the sensor/finance aggregate where
    each observation holds until the next one, so its weight is the
    INTERVAL it was in force, not 1 (a plain mean over-counts bursts and
    under-counts stable stretches: ten readings of 5.0 in one second
    followed by an hour at 10.0 average ~5.5 arithmetically but ~10
    time-weighted).

    One window pass per key (``lead`` finds each observation's
    hold-until timestamp; the final observation carries no interval and
    drops out, the standard left-closed convention), then one integer/
    DECIMAL aggregate: Σ value·Δt as DECIMAL(28,6) — order-independent,
    engine-exact — over Σ Δt. Same single-shuffle shape and hot-key
    remedy as the other per-key window operators.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    dt_us = F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    stepped = df.select(
        F.col(key_col), F.col(value_col).alias("_v"), dt_us.alias("_dt")
    ).filter(F.col("_dt").isNotNull())
    wsum = F.sum(
        (F.col("_v") * F.col("_dt") / F.lit(1_000_000.0)).cast("decimal(28,6)")
    )
    tsum = F.sum((F.col("_dt") / F.lit(1_000_000.0)).cast("decimal(28,6)"))
    # nullif guards ANSI DIVIDE_BY_ZERO when a key's events all share one
    # timestamp (span 0): twa is NULL there, not an error
    return stepped.groupBy(key_col).agg(
        F.round((wsum / F.nullif(tsum, F.lit(0).cast("decimal(28,6)"))).cast("double"), 6).alias("twa"),
        tsum.cast("double").alias("span_seconds"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_obs"),
    )


def forecast_backtest(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    cutoff,
    min_points: int = 3,
) -> DataFrame:
    """Backtest the linear-trend forecaster: fit per key on rows BEFORE
    ``cutoff`` (a timestamp column expression), score rows at/after it,
    and report per-key MAPE/MAE — the honest time-respecting evaluation
    (random splits leak the future into the fit; every forecasting
    pipeline needs this readout before the model ships).

    Same exact-DECIMAL OLS as :func:`forecast_linear` (12-decimal
    coefficients); predictions and per-row errors round to 6 decimals and
    the error means sum DECIMAL — the whole report is engine- and
    partitioning-exact. Zero actuals are excluded from MAPE (the standard
    convention; they make the ratio undefined), counted in ``n_test``.
    Shape: one groupBy for the fit, broadcast of the tiny per-key
    coefficient table onto the test rows, one final per-key aggregate."""
    from .profiling import linear_fit

    base = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    x = (F.unix_micros(F.col(ts_col)) - base) / F.lit(1000000.0)
    train = df.filter(F.col(ts_col) < cutoff)
    test = df.filter(F.col(ts_col) >= cutoff)
    fits = linear_fit(
        train.select(*keys, ts_col, value_col), keys, x, F.col(value_col),
        min_points, round_decimals=12,
    ).select(*keys, "slope", "intercept")
    scored = test.join(F.broadcast(fits), list(keys)).select(
        *keys,
        F.col(value_col).alias("_y"),
        F.round(F.col("slope") * x + F.col("intercept"), 6).alias("_yhat"),
    )
    ape = F.round(
        F.abs((F.col("_yhat") - F.col("_y")) / F.nullif(F.col("_y"), F.lit(0.0))), 6
    )
    ae = F.round(F.abs(F.col("_yhat") - F.col("_y")), 6)
    return (
        scored.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.round(
                F.sum(ape.cast("decimal(28,6)")).cast("double")
                / F.nullif(F.count(ape), F.lit(0)),
                6,
            ).alias("mape"),
            F.round(
                F.sum(ae.cast("decimal(28,6)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("mae"),
        )
    )


def cusum(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """One-sided CUSUM control chart per key: the classic
    S_n = max(0, S_{n−1} + (x_n − target − slack)) drift detector,
    alerting where S_n > threshold — catches small sustained shifts that
    per-point z-scores miss (SLO burn, slow quality regressions).

    The recursion LOOKS inherently sequential, but the closed form
    S_n = prefix_n − min(prefix_0..prefix_n) over the running sum
    prefix_n = Σ(x_i − target − slack) turns it into two window passes —
    a running DECIMAL sum (exact, order-independent addends) and a
    running min — so the operator stays declarative, parallel across
    keys, and engine-portable. The same identity is stated in the
    oracle; no stateful UDF needed.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    step = (F.col(value_col) - F.lit(target) - F.lit(slack)).cast("decimal(28,6)")
    prefix = F.sum(step).over(w)
    base = df.withColumn("_prefix", prefix)
    # min over prefix_0..prefix_n includes the virtual prefix_0 = 0
    run_min = F.least(
        F.lit(0).cast("decimal(28,6)"), F.min("_prefix").over(w)
    )
    out = base.withColumn(
        "cusum", F.round((F.col("_prefix") - run_min).cast("double"), 6)
    )
    return out.select(
        *keys,
        ts_col,
        *( [tiebreak_col] if tiebreak_col else [] ),
        F.col(value_col),
        "cusum",
        (F.col("cusum") > F.lit(threshold)).alias("alert"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival curve with right-censoring — time-to-event
    analytics (churn, hardware failure, subscription survival) done
    correctly: censored subjects (still alive at last observation) leave
    the risk set without counting as deaths, which naive "fraction still
    here at t" curves get wrong.

    Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times, with nᵢ the
    at-risk count just before tᵢ. Shape: one groupBy to per-duration
    (deaths, censored) counts, then BUCKET-PARALLEL cumulative sums over
    the compressed duration domain (``ranks.bucketed_cumsum`` — with
    fine-grained durations the distinct-duration table is data-sized at
    100×, so an unpartitioned ``Window.orderBy`` would be one task). The
    product runs in log space (Catalyst has no product aggregate); each
    log increment is quantized to 12 decimals and summed as
    DECIMAL(38,12), making the cumulative sum EXACT and
    order/association-independent — the bucketed offset-stitch
    re-associates addends, so a raw double fold could differ in the last
    ulp. A duration where the whole risk set dies (d == n) zeroes the
    curve from there on via an explicit cumulative dead-flag (DECIMAL
    cannot carry the −inf sentinel and ANSI would throw on the cast).
    Returns one row per distinct duration:
    ``(duration, n_risk, n_events, n_censored, survival)``; survival hits
    exactly 0 when the last risk set dies out."""
    from .ranks import bucketed_cumsum

    d = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("int")
    # NULL durations hold no place on the time axis and are EXCLUDED from
    # both the curve and every risk set (previously they were dropped from
    # the rank domain but still counted into the total — inflating n_risk)
    per = (
        df.filter(d.isNotNull())
        .select(d.alias("duration"), e.alias("_e"))
        .groupBy("duration")
        .agg(
            F.sum("_e").cast("long").alias("n_events"),
            (F.count(F.lit(1)) - F.sum("_e")).cast("long").alias("n_censored"),
        )
    )
    total = per.agg(F.sum(F.col("n_events") + F.col("n_censored")).alias("_N"))
    risk = (
        bucketed_cumsum(
            per,
            "duration",
            {"_rm": F.col("n_events") + F.col("n_censored")},
            inclusive=False,
        )
        .crossJoin(F.broadcast(total))
        .withColumn("n_risk", (F.col("_N") - F.col("_rm")).cast("long"))
        .drop("_rm", "_N")
    )
    term = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.round(
            F.log(F.lit(1.0) - F.col("n_events") / F.col("n_risk")), 12
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(38,12)")
    dead = (F.col("n_events") >= F.col("n_risk")).cast("int")
    cum = bucketed_cumsum(
        risk.withColumn("_t", term).withColumn("_dd", dead),
        "duration",
        {"_ls": "_t", "_dead": "_dd"},
        inclusive=True,
    )
    surv = F.when(F.col("_dead") > 0, F.lit(0.0)).otherwise(
        F.exp(F.col("_ls").cast("double"))
    )
    return cum.select(
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(surv, round_decimals).alias("survival"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col,
    round_decimals: int = 6,
) -> DataFrame:
    """Log-rank test: do two right-censored survival curves differ — the
    standard significance test to go with :func:`kaplan_meier` (is
    segment A churning faster than segment B, accounting for censoring).

    At each distinct duration with deaths, group 1's expected deaths
    under H₀ are d·n₁/n over the combined risk set; the statistic is
    χ² = (Σ(d₁−E₁))² / ΣV with the hypergeometric variance
    V = d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1). Risk sets come from per-group
    BUCKET-PARALLEL cumulative sums over the compressed duration domain
    (``ranks.bucketed_cumsum`` — exact integer counts, so the bucketed
    offset re-association is bit-identical to the one-task global window
    it replaces); every count is an exact integer, the E/V terms are the
    only floats and fold once in the final single-row aggregate. Returns
    one row ``(n1, n0, observed1, expected1, chi2)`` (χ² vs 1 dof)."""
    from .ranks import bucketed_cumsum

    d = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("int")
    g = (F.col(group_col) if isinstance(group_col, str) else group_col).cast(
        "int"
    )
    per = (
        df.filter(d.isNotNull())
        .select(d.alias("t"), e.alias("_e"), g.alias("_g"))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("_g") == 1, F.col("_e"))).cast("long").alias("d1"),
            F.sum(F.when(F.col("_g") == 0, F.col("_e"))).cast("long").alias("d0"),
            F.sum(F.when(F.col("_g") == 1, 1)).cast("long").alias("a1"),
            F.sum(F.when(F.col("_g") == 0, 1)).cast("long").alias("a0"),
        )
        .na.fill(0, ["d1", "d0", "a1", "a0"])
    )
    tot = per.agg(
        F.sum("a1").alias("_N1"), F.sum("a0").alias("_N0")
    )
    risk = (
        bucketed_cumsum(
            per, "t", {"_ca1": "a1", "_ca0": "a0"}, inclusive=False
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d1",
            "d0",
            (F.col("_N1") - F.col("_ca1")).cast("long").alias("n1"),
            (F.col("_N0") - F.col("_ca0")).cast("long").alias("n0"),
            F.col("_N1"),
            F.col("_N0"),
        )
    )
    n = (F.col("n1") + F.col("n0")).cast("double")
    dd = (F.col("d1") + F.col("d0")).cast("double")
    e1 = dd * F.col("n1") / n
    v = F.when(
        (dd > 0) & (n > 1),
        dd
        * (F.col("n1") / n)
        * (1.0 - F.col("n1") / n)
        * (n - dd)
        / (n - 1.0),
    ).otherwise(F.lit(0.0))
    return risk.agg(
        F.first("_N1").cast("bigint").alias("n1"),
        F.first("_N0").cast("bigint").alias("n0"),
        F.sum("d1").cast("bigint").alias("observed1"),
        F.round(F.sum(e1), round_decimals).alias("expected1"),
        F.round(
            (F.sum(F.col("d1") - e1) * F.sum(F.col("d1") - e1))
            / F.nullif(F.sum(v), F.lit(0.0)),
            round_decimals,
        ).alias("chi2"),
    )


def seasonal_decompose(
    df: DataFrame,
    keys: Sequence[str],
    day_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive seasonal-trend decomposition of a daily series (the
    classical-decomposition core of STL): trend = centered ``period``-day
    moving average, seasonal = mean detrended value per position-in-cycle
    (day-of-week for period 7), remainder = observed − trend − seasonal —
    the "is this spike real or just Tuesday" readout.

    Everything is windows and one small per-(key, position) aggregate:
    the centered MA runs over a ROWS frame on the per-key daily series
    (defined only where the full window exists — edges stay NULL, the
    honest convention), means sum DECIMAL (6-decimal-exact, engine- and
    order-independent). Returns one row per (keys…, day) with
    ``y/trend/seasonal/remainder``."""
    from pyspark.sql import Window

    # frame of EXACTLY `period` rows: centered for odd periods, one row
    # heavier on the past for even ones (a 7-row frame is (-3, 3); a
    # 14-row frame is (-7, 6) — a naive (-half, half) frame holds
    # period+1 rows for even periods and the ==period guard never fires)
    lo = -(period // 2)
    hi = period + lo - 1
    w = (
        Window.partitionBy(*keys)
        .orderBy(day_col)
        .rowsBetween(lo, hi)
    )
    dec = "decimal(28,6)"
    base = df.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.round(
                F.sum(F.col(value_col).cast(dec)).over(w).cast("double")
                / F.lit(float(period)),
                6,
            ),
        ),
    )
    pos = F.pmod(F.dayofweek(F.col(day_col)) + F.lit(5), F.lit(7)) if period == 7 else (
        F.pmod(F.datediff(F.col(day_col), F.lit("2024-01-01").cast("date")), F.lit(period))
    )
    base = base.withColumn("_pos", pos)
    seas = (
        base.filter(F.col("trend").isNotNull())
        .groupBy(*keys, "_pos")
        .agg(
            F.round(
                F.sum((F.col(value_col) - F.col("trend")).cast(dec)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("seasonal")
        )
    )
    return (
        base.join(seas, [*keys, "_pos"], "left")
        .select(
            *keys,
            day_col,
            F.round(F.col(value_col).cast("double"), 6).alias("y"),
            "trend",
            "seasonal",
            F.round(
                F.col(value_col) - F.col("trend") - F.col("seasonal"), 6
            ).alias("remainder"),
        )
    )


def rmst(km: DataFrame, tau: float, round_decimals: int = 6) -> DataFrame:
    """Restricted mean survival time: the area under the Kaplan–Meier
    curve up to horizon ``tau`` — "expected active days in the first τ" —
    the single-number survival summary that stays well-defined under
    censoring (the plain mean does not when the tail is censored).

    Takes :func:`kaplan_meier` output. The step integral is one GLOBAL
    lag over the distinct-duration table — data-sized at 100× with
    fine-grained durations, so it routes through ``ranks.bucketed_lag``
    (bucket-parallel, exactly equal to the one-task global window):
    Σ S(t_{i−1})·(min(t_i,τ) − min(t_{i−1},τ)) plus the tail rectangle
    S(t_last)·(τ − min(t_last,τ)). Survival values are 6-decimal-exact
    and durations integers, so the DECIMAL term sum is engine-exact."""
    from .ranks import bucketed_lag

    lagged = bucketed_lag(
        km, "duration", {"_d_prev": "duration", "_s_prev": "survival"}
    )
    t = F.least(F.col("duration").cast("double"), F.lit(float(tau)))
    t_prev = F.least(
        F.coalesce(F.col("_d_prev"), F.lit(0)).cast("double"),
        F.lit(float(tau)),
    )
    s_prev = F.coalesce(F.col("_s_prev"), F.lit(1.0))
    stepped = lagged.select(
        (s_prev * (t - t_prev)).cast("decimal(28,6)").alias("_a"),
        F.col("duration"),
        F.col("survival"),
    )
    tail = km.agg(
        (
            F.max_by("survival", "duration")
            * (F.lit(float(tau)) - F.least(F.max("duration").cast("double"), F.lit(float(tau))))
        )
        .cast("decimal(28,6)")
        .alias("_tail")
    )
    return (
        stepped.crossJoin(F.broadcast(tail))
        .agg(
            F.lit(float(tau)).alias("tau"),
            F.round(
                (F.sum("_a") + F.first("_tail")).cast("double"), round_decimals
            ).alias("rmst"),
        )
    )


def autocorrelation(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Per-key sample autocorrelation function (ACF) at lags 1..``max_lag``
    — the seasonality/momentum fingerprint of a series (a weekly cycle
    shows as a spike at lag 7; white noise decays immediately). Uses the
    standard biased estimator r_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²
    with the GLOBAL per-key mean, so r_0 ≡ 1 and |r_k| ≤ 1.

    Scale shape: the window pass per key assigns observation index t
    (shuffle on the key), per-key mean and denominator are aggregates
    over the same partitioning, and the lagged pairing is a bounded
    explode — each observation emits ``max_lag`` (t+k, k) probe rows
    joined back equi on (key, t) — never a theta self-join. Rows
    through the shuffle: n·max_lag of (key, t, centered-value) triples.
    The indexed table and its centered form feed several branches each
    (mean join, denominator, both pair-join sides), so both persist for
    the query's lifetime — the sort and scan run once.

    Cross-engine determinism: values quantize to 6 decimals, per-term
    products round(·, 6) then sum as DECIMAL(28,6) (order-independent,
    exact — the perplexity pattern), and the single num/den division is
    double + round(6). A zero denominator (constant series) yields NULL.
    """
    from ..caching import scoped_persist

    ks = list(keys)
    w = Window.partitionBy(*ks).orderBy(order_col)
    dec = "decimal(28,6)"
    base = scoped_persist(
        df.select(
            *ks,
            F.row_number().over(w).alias("_t"),
            F.round(F.col(value_col).cast("double"), 6).alias("_v"),
        )
    )
    st = base.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_v").cast(dec)).cast("double").alias("_s"),
    )
    cent = scoped_persist(
        base.join(st, ks).select(
            *ks, "_t", (F.col("_v") - F.col("_s") / F.col("_n")).alias("_c")
        )
    )
    den = cent.groupBy(*ks).agg(
        F.sum(F.round(F.col("_c") * F.col("_c"), 6).cast(dec))
        .cast("double")
        .alias("_den")
    )
    # columns renamed so the lineage-shared self-join stays unambiguous
    contrib = cent.select(
        *[F.col(k).alias("_ck_" + k) for k in ks],
        F.col("_t").alias("_tsrc"),
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("lag"),
        F.col("_c").alias("_clag"),
    ).withColumn("_t2", F.col("_tsrc") + F.col("lag"))
    cond = F.col("_t") == F.col("_t2")
    for k in ks:
        cond = cond & (F.col(k) == F.col("_ck_" + k))
    num = (
        cent.join(contrib, cond)
        .groupBy(*ks, "lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.round(F.col("_c") * F.col("_clag"), 6).cast(dec))
            .cast("double")
            .alias("_num"),
        )
    )
    return num.join(den, ks).select(
        *ks,
        F.col("lag").cast("bigint").alias("lag"),
        "n_pairs",
        F.round(F.col("_num") / F.nullif(F.col("_den"), F.lit(0.0)), 6).alias("acf"),
    )


def partial_autocorrelation(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Per-key partial autocorrelation (PACF) at lags 1..``max_lag`` —
    the AR-order fingerprint (an AR(p) series cuts off after lag p while
    its plain ACF decays slowly; PACF at lag k is the correlation left
    after regressing out lags 1..k−1). Computed from the distributed
    :func:`autocorrelation` table by the Durbin–Levinson recursion,
    applied per key as an Arrow-batched grouped map: each key's input is
    its ≤``max_lag`` ACF rows — O(K²) floats per key, distributed across
    keys, never a driver-side collect.
    """
    import pandas as pd

    acf = autocorrelation(df, keys, order_col, value_col, max_lag)
    ks = list(keys)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in acf.schema.fields
        if f.name in ks
    )
    out_schema = f"{key_fields}, lag bigint, pacf double"

    def durbin_levinson(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lag", ignore_index=True)
        r = pdf["acf"].to_numpy(dtype="float64")
        lags = pdf["lag"].to_numpy()
        if len(r) == 0 or not (r == r).all():  # constant series → NULL acf
            res = pdf[ks + ["lag"]].copy()
            res["pacf"] = None
            return res
        phi_prev: list[float] = []
        out = []
        for k in range(1, len(r) + 1):
            rk = r[k - 1]
            if k == 1:
                phi_kk = rk
                phi = [phi_kk]
            else:
                num = rk - sum(
                    phi_prev[j] * r[k - 2 - j] for j in range(k - 1)
                )
                den = 1.0 - sum(phi_prev[j] * r[j] for j in range(k - 1))
                phi_kk = num / den if den != 0.0 else float("nan")
                phi = [
                    phi_prev[j] - phi_kk * phi_prev[k - 2 - j]
                    for j in range(k - 1)
                ] + [phi_kk]
            out.append(round(phi_kk, 6) if phi_kk == phi_kk else None)
            phi_prev = phi
        res = pdf[ks + ["lag"]].copy()
        res["pacf"] = out
        res["lag"] = lags
        return res

    return acf.groupBy(*ks).applyInPandas(durbin_levinson, out_schema)


def harmonic_regression(
    df: DataFrame,
    day_col: str,
    value_col: str,
    period: float = 7.0,
    n_harmonics: int = 2,
    l2: float = 0.0,
) -> DataFrame:
    """Harmonic (Fourier) seasonality fit: regress the series on
    sin/cos(2πk·t/period) features plus trend — the parametric
    alternative to seasonal_decompose that yields a CLOSED-FORM seasonal
    curve (amplitude/phase per harmonic) instead of per-position means,
    works with missing days, and extrapolates. y ~ β₀ + β₁·t +
    Σ_k [a_k sin + b_k cos]; amplitude_k = √(a_k² + b_k²).

    Distribution shape is inherited from :func:`fit_ridge` (one exact-
    DECIMAL normal-equation pass over 2+2·n_harmonics features, tiny
    driver solve); the day index t is days since the series minimum,
    kept IN-PLAN via a 1-row broadcast. Returns the coefficient rows
    plus one ``amplitude_k`` row per harmonic.
    """
    import math

    from ..operators.linear_model import fit_ridge

    mn = df.agg(F.min(F.col(day_col)).alias("_d0"))
    base = df.crossJoin(F.broadcast(mn)).withColumn(
        "_t", F.datediff(F.col(day_col).cast("date"), F.col("_d0").cast("date")).cast("double")
    )
    feats = ["_t"]
    for k in range(1, n_harmonics + 1):
        w = 2.0 * math.pi * k / period
        base = base.withColumn(f"_sin{k}", F.sin(F.col("_t") * w)).withColumn(
            f"_cos{k}", F.cos(F.col("_t") * w)
        )
        feats += [f"_sin{k}", f"_cos{k}"]
    coefs = fit_ridge(base, feats, value_col, l2=l2)
    rows = {r["feature"]: r["coef"] for r in coefs.collect()}
    out = [(k, v) for k, v in rows.items()]
    for k in range(1, n_harmonics + 1):
        amp = math.sqrt(rows[f"_sin{k}"] ** 2 + rows[f"_cos{k}"] ** 2)
        out.append((f"amplitude_{k}", round(amp, 6)))
    spark = df.sparkSession
    return spark.createDataFrame(out, "feature string, coef double")


def concurrency_gauge(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    grain: str = "hour",
) -> DataFrame:
    """Sweep-line concurrency gauge over [start, end] intervals: how many
    intervals are simultaneously open at each moment, reported per time
    bucket as its PEAK and CLOSE values — the "max concurrent sessions per
    hour" / connection-pool-sizing readout. Ends are inclusive: an
    interval ending at t is still counted at t.

    The classic formulation is a running sum over the globally-ordered
    boundary stream — a single-task window. This is the two-level
    decomposition that scales: (1) boundaries collapse to one row per
    DISTINCT timestamp (starts/ends counted per ts), (2) per-bucket
    running sums are windows PARTITIONED by bucket (parallel across
    buckets), and (3) the only global window runs over the per-bucket
    aggregate — one row per bucket, ~10⁴ rows for a year of hours, the
    same bounded-domain shape as the gap-fill segment grid above.

    Concurrency at a distinct ts = (starts ≤ ts) − (ends < ts)
      = carry-in + within-bucket cumulative (starts − ends) + ends@ts.

    Returns (bucket, peak_concurrency, close_concurrency) per bucket that
    contains at least one boundary; buckets strictly inside long intervals
    (no boundary falls in them) are not emitted — their gauge equals the
    previous bucket's close (gap-fill downstream if a dense grid is
    needed).
    """
    s = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("_st"), F.lit(0).alias("_en")
    )
    e = intervals.select(
        F.col(end_col).alias("ts"), F.lit(0).alias("_st"), F.lit(1).alias("_en")
    )
    per_ts = (
        s.unionByName(e)
        .groupBy("ts")
        .agg(F.sum("_st").alias("_s"), F.sum("_en").alias("_e"))
        .withColumn("bucket", F.date_trunc(grain, F.col("ts")))
    )
    # per-bucket totals → carry-in before each bucket (global window over
    # the bucket-grain aggregate only: bounded domain)
    per_bucket = per_ts.groupBy("bucket").agg(
        F.sum("_s").alias("_bs"), F.sum("_e").alias("_be")
    )
    w_carry = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carry = per_bucket.select(
        "bucket",
        (F.sum("_bs").over(w_carry) - F.col("_bs")).alias("_cs"),
        (F.sum("_be").over(w_carry) - F.col("_be")).alias("_ce"),
        # gauge at the bucket's last boundary, ends-exclusive going
        # forward: exactly the carry-in of the NEXT bucket
        (F.sum("_bs").over(w_carry) - F.sum("_be").over(w_carry))
        .cast("bigint")
        .alias("close_concurrency"),
    )
    # within-bucket cumulative, parallel across buckets
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gauged = per_ts.join(carry, "bucket").select(
        "bucket",
        "close_concurrency",
        (
            F.col("_cs")
            + F.sum("_s").over(w_in)
            - (F.col("_ce") + F.sum("_e").over(w_in))
            + F.col("_e")
        ).alias("_conc"),
    )
    return gauged.groupBy("bucket", "close_concurrency").agg(
        F.max("_conc").cast("bigint").alias("peak_concurrency")
    ).select("bucket", "peak_concurrency", "close_concurrency")


def changepoint_binary(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Single-changepoint detection per series by binary segmentation
    (Scott & Knott 1974 / the first split of PELT-style methods): the
    split minimizing total within-segment squared error, computed for
    EVERY candidate split from one pass of prefix sums — SSE(1..k) =
    S2_k − S1_k²/k needs only the cumulative Σy and Σy², so the argmin
    over n−1 candidates costs one per-key window, not n fits.

    Emits (key, change_point, n_points, sse_nochange, sse_split,
    drop_ratio): drop_ratio near 0 ⇒ no structural break; large ⇒ the
    mean shifted at change_point (the first segmentation a capacity/
    incident review runs on a daily metric). Ties break to the earliest
    split. Series are per-key aggregates (days, hours) — the bounded
    compressed domain, so per-key windows never see raw-event volume.
    """
    w = Window.partitionBy(key_col).orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wk = Window.partitionBy(key_col)
    y = F.col(value_col).cast("double")
    pre = df.select(
        F.col(key_col),
        F.col(time_col),
        F.sum(y).over(w).alias("_s1"),
        F.sum(y * y).over(w).alias("_s2"),
        F.row_number()
        .over(Window.partitionBy(key_col).orderBy(time_col))
        .alias("_k"),
        F.count(F.lit(1)).over(wk).alias("_n"),
        F.sum(y).over(wk).alias("_t1"),
        F.sum(y * y).over(wk).alias("_t2"),
    )
    cand = pre.filter(F.col("_k") < F.col("_n")).select(
        F.col(key_col),
        F.col(time_col),
        "_k",
        "_n",
        "_t1",
        "_t2",
        (
            (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_k"))
            + (
                (F.col("_t2") - F.col("_s2"))
                - (F.col("_t1") - F.col("_s1"))
                * (F.col("_t1") - F.col("_s1"))
                / (F.col("_n") - F.col("_k"))
            )
        ).alias("_sse"),
    )
    best = cand.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(key_col).orderBy(F.col("_sse").asc(), F.col(time_col).asc())
        ),
    ).filter(F.col("_rn") == 1)
    return best.select(
        F.col(key_col),
        F.col(time_col).alias("change_point"),
        F.col("_n").cast("bigint").alias("n_points"),
        F.round(F.col("_t2") - F.col("_t1") * F.col("_t1") / F.col("_n"), 6).alias(
            "sse_nochange"
        ),
        F.round("_sse", 6).alias("sse_split"),
        F.round(
            (F.col("_t2") - F.col("_t1") * F.col("_t1") / F.col("_n") - F.col("_sse"))
            / F.nullif(
                F.col("_t2") - F.col("_t1") * F.col("_t1") / F.col("_n"), F.lit(0.0)
            ),
            6,
        ).alias("drop_ratio"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Nelson–Aalen cumulative hazard with right-censoring (Nelson 1972;
    Aalen 1978): Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ with variance Σ dᵢ/nᵢ² — the
    additive companion to :func:`kaplan_meier` (H = −ln S asymptotically;
    hazard INCREMENTS are what you read rate changes from, and sums are
    friendlier than products for comparing groups). Identical shape: one
    groupBy to per-duration counts, then BUCKET-PARALLEL cumulative sums
    over the compressed duration domain (``ranks.bucketed_cumsum`` — the
    distinct-duration table is data-sized at 100×, so an unpartitioned
    window would be one task). Hazard increments quantize to 12 decimals
    and sum as DECIMAL(38,12) — exact and association-independent, so the
    bucketed offset stitch is bit-identical to a sequential fold. Returns
    (duration, n_risk, n_events, n_censored, cum_hazard, hazard_var)."""
    from .ranks import bucketed_cumsum

    d = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("int")
    # NULL durations hold no place on the time axis and are EXCLUDED from
    # both the curve and every risk set (previously they were dropped from
    # the rank domain but still counted into the total — inflating n_risk)
    per = (
        df.filter(d.isNotNull())
        .select(d.alias("duration"), e.alias("_e"))
        .groupBy("duration")
        .agg(
            F.sum("_e").cast("long").alias("n_events"),
            (F.count(F.lit(1)) - F.sum("_e")).cast("long").alias("n_censored"),
        )
    )
    total = per.agg(F.sum(F.col("n_events") + F.col("n_censored")).alias("_N"))
    risk = (
        bucketed_cumsum(
            per,
            "duration",
            {"_rm": F.col("n_events") + F.col("n_censored")},
            inclusive=False,
        )
        .crossJoin(F.broadcast(total))
        .withColumn("n_risk", (F.col("_N") - F.col("_rm")).cast("long"))
        .drop("_rm", "_N")
    )
    nr = F.col("n_risk").cast("double")
    cum = bucketed_cumsum(
        risk.withColumn(
            "_th",
            F.round(F.col("n_events") / nr, 12).cast("decimal(38,12)"),
        ).withColumn(
            "_tv",
            F.round(F.col("n_events") / (nr * nr), 12).cast("decimal(38,12)"),
        ),
        "duration",
        {"_ch": "_th", "_hv": "_tv"},
        inclusive=True,
    )
    return cum.select(
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(F.col("_ch").cast("double"), round_decimals).alias("cum_hazard"),
        F.round(F.col("_hv").cast("double"), round_decimals).alias("hazard_var"),
    )


def kaplan_meier_grouped(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-segment Kaplan–Meier curves — one survival curve per value of
    ``group_col``, the form cohort/priority/treatment comparisons actually
    read (the pooled :func:`kaplan_meier` is the single-curve special
    case; :func:`logrank_test` is the significance test between two of
    these curves).

    Shape: cumulative sums over the per-(group, duration) compressed
    domain with windows PARTITIONED BY the group — parallel across
    segments, lint-clean, and each segment's window carries only its own
    distinct durations. The scale caveat is per-segment: a single segment
    whose distinct-duration domain is itself data-sized sorts in one task
    — for few-and-huge segments with fine-grained durations, pre-quantize
    durations (day granularity) or run the pooled bucketed form per
    segment. Same DECIMAL(38,12)-quantized log-space product as the
    pooled form, so results are association-independent and engine-exact.
    Returns one row per (group, distinct duration):
    ``(group, duration, n_risk, n_events, n_censored, survival)``."""
    from pyspark.sql import Window

    d = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("int")
    per = (
        df.filter(d.isNotNull())
        .select(F.col(group_col).alias("grp"), d.alias("duration"), e.alias("_e"))
        .groupBy("grp", "duration")
        .agg(
            F.sum("_e").cast("long").alias("n_events"),
            (F.count(F.lit(1)) - F.sum("_e")).cast("long").alias("n_censored"),
        )
    )
    w_all = (
        Window.partitionBy("grp")
        .orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("grp")
    risk = per.withColumn(
        "n_risk",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(w_tot)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_all),
                F.lit(0),
            )
        ).cast("long"),
    )
    term = (
        F.when(
            F.col("n_events") < F.col("n_risk"),
            F.round(
                F.log(F.lit(1.0) - F.col("n_events") / F.col("n_risk")), 12
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(38,12)")
    )
    dead = (F.col("n_events") >= F.col("n_risk")).cast("int")
    cum = risk.withColumn("_ls", F.sum(term).over(w_cum)).withColumn(
        "_dead", F.sum(dead).over(w_cum)
    )
    surv = F.when(F.col("_dead") > 0, F.lit(0.0)).otherwise(
        F.exp(F.col("_ls").cast("double"))
    )
    return cum.select(
        F.col("grp").alias(group_col),
        "duration",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(surv, round_decimals).alias("survival"),
    )


def rmst_grouped(
    kmg: DataFrame,
    tau: float,
    group_col: str = "grp",
    round_decimals: int = 6,
) -> DataFrame:
    """Restricted mean survival time PER SEGMENT — the between-arm
    effect-size companion to :func:`kaplan_meier_grouped` (RMST
    difference is the recommended reporting metric when proportional
    hazards fail; Royston & Parmar 2013). Takes grouped-KM output; the
    step integral is one ``lag`` window PARTITIONED BY segment (parallel
    across segments, each carrying its own compressed duration domain)
    plus the per-segment tail rectangle S(t_last)·(τ − min(t_last, τ)).
    Survival values are 6-decimal-exact and durations integers, so the
    DECIMAL term sum is engine-exact. Returns one row per segment:
    ``(group, tau, rmst)``."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("duration")
    t = F.least(F.col("duration").cast("double"), F.lit(float(tau)))
    t_prev = F.least(
        F.coalesce(F.lag("duration").over(w), F.lit(0)).cast("double"),
        F.lit(float(tau)),
    )
    s_prev = F.coalesce(F.lag("survival").over(w), F.lit(1.0))
    stepped = kmg.select(
        F.col(group_col),
        (s_prev * (t - t_prev)).cast("decimal(28,6)").alias("_a"),
        "duration",
        "survival",
    )
    tails = kmg.groupBy(group_col).agg(
        (
            F.max_by("survival", "duration")
            * (
                F.lit(float(tau))
                - F.least(F.max("duration").cast("double"), F.lit(float(tau)))
            )
        )
        .cast("decimal(28,6)")
        .alias("_tail")
    )
    return (
        stepped.groupBy(group_col)
        .agg(F.sum("_a").alias("_area"))
        .join(tails, group_col)
        .select(
            group_col,
            F.lit(float(tau)).alias("tau"),
            F.round(
                (F.col("_area") + F.col("_tail")).cast("double"), round_decimals
            ).alias("rmst"),
        )
    )


def ljung_box(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Ljung–Box portmanteau white-noise test statistic per key:
    Q = n(n+2) Σ_{h=1..H} r_h² / (n−h) over the first ``max_lag``
    autocorrelations (Ljung & Box, Biometrika 1978) — the standard
    "is anything left in the residuals" gate after detrending or
    forecasting; under white noise Q ~ χ²(H), so large Q flags
    remaining structure. Built directly on :func:`autocorrelation`
    (r_h and n−h = n_pairs ride its output — no extra pass over the
    series); the per-lag terms round-then-DECIMAL-sum so Q is
    independent of summation order (cross-engine float rule). A
    constant series (NULL acf) yields a NULL statistic.

    Returns one row per key: (keys…, n_obs, h_lags, q_stat)."""
    ks = list(keys)
    r = autocorrelation(df, ks, order_col, value_col, max_lag)
    n = (F.max(F.col("n_pairs") + F.col("lag"))).cast("double")
    s = F.sum(
        F.round(
            (F.col("acf") * F.col("acf")) / F.col("n_pairs").cast("double"), 12
        ).cast("decimal(38,12)")
    ).cast("double")
    return r.groupBy(*ks).agg(
        n.cast("bigint").alias("n_obs"),
        F.count(F.lit(1)).cast("bigint").alias("h_lags"),
        F.round(n * (n + F.lit(2.0)) * s, 6).alias("q_stat"),
    )
