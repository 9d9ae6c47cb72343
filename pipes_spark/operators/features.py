"""Feature-engineering operators for training-data pipelines: the
transforms that turn curated rows into model inputs, designed (like the
rest of the library) to be exact, engine-portable, and one-shuffle.

* leave-one-out target encoding — the high-cardinality-categorical
  workhorse, with the own-row exclusion that prevents target leakage;
* the hashing trick — fixed-width sparse features from unbounded token
  vocabularies with no dictionary to build, ship, or keep consistent.

Both use the same portable-hash / DECIMAL-sum determinism contracts as
operators.sampling / operators.profiling, so they are DuckDB-oracle
checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .text import tokens


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is replaced by
    the mean of the TARGET over the other rows of that category —
    ``(Σ_group − own) / (n_group − 1)`` — the standard high-cardinality
    categorical encoding, with the own-row exclusion that keeps the
    feature from leaking its own label (plain mean encoding memorizes
    singleton categories perfectly). Categories with one row encode
    NULL (no peers — the caller imputes a global prior downstream).

    One groupBy producing (n, Σ) per category as DECIMAL(28,6) —
    map-side combined, exact, order-independent — broadcast back onto
    the rows; the per-row arithmetic is codegen'd and rounded at 6, so
    the encoding is engine-portable.
    """
    stats = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(target_col).cast("decimal(28,6)")).alias("_s"),
    )
    loo = (
        (F.col("_s").cast("double") - F.col(target_col))
        / F.nullif(F.col("_n") - 1, F.lit(0))
    )
    return (
        df.join(F.broadcast(stats), cat_col)
        .withColumn(out_col, F.round(loo, 6))
        .drop("_n", "_s")
    )


def feature_hash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_features: int = 64,
    salt: str = "fh",
) -> DataFrame:
    """The hashing trick (Weinberger 2009): tokens map to a fixed
    ``num_features``-wide space by hash, producing sparse (id, bucket,
    count) features with NO vocabulary to build or synchronize — the
    property that matters at corpus scale, where a dictionary is a
    second distributed artifact that drifts.

    Buckets derive from the portable md5 hash (same primitive as the
    sampling family), so the exact same features come out of any
    engine, partitioning, or rerun — and the oracle can recompute them.
    Shape: explode tokens map-side, one (id, bucket) count aggregate —
    a single shuffle whose payload is two ints per token occurrence.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_t")
    )
    bucket = F.pmod(hash_bucket(F.col("_t"), salt), F.lit(num_features))
    return (
        tok.withColumn("bucket", bucket.cast("bigint"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
    )


def pmi_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    round_decimals: int = 6,
) -> DataFrame:
    """Pointwise mutual information between items co-occurring in the same
    group (events per user, tokens per document, products per basket) —
    the association-strength feature that, unlike raw co-counts, discounts
    globally frequent items.

    PMI(a,b) = ln( n_ab · N / (n_a · n_b) ) over group-presence counts
    (N = number of groups, kept in-plan as a 1-row aggregate cross-joined
    broadcast). Shape: one distinct to (group, item) presence (persisted
    for the query's lifetime — it feeds the pair join, the marginals, and
    N), a group-keyed self-join for pairs (bounded by per-group item-set
    size), then broadcast marginals. All counts are exact integers; the
    single ln runs on the same double in every engine."""
    from ..caching import scoped_persist

    pres = scoped_persist(
        df.select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i")).distinct()
    )
    # N stays IN-PLAN (1-row aggregate cross-joined broadcast) — no eager
    # driver action at construction time, no second scan of the input
    ng = pres.agg(F.count_distinct("_g").alias("_ng"))
    marg = pres.groupBy("_i").agg(F.count(F.lit(1)).alias("_n"))
    a = pres.select("_g", F.col("_i").alias("item_a"))
    b = pres.select("_g", F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    # ratio runs in DOUBLE: BIGINT marginal products overflow LONG under
    # ANSI at large group counts (CLAUDE.md's long-multiply fact); counts
    # below 2^53 convert exactly, and the value feeds ln() anyway
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("_i").alias("item_a"), F.col("_n").alias("_na"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("_i").alias("item_b"), F.col("_n").alias("_nb"))),
            "item_b",
        )
        .crossJoin(F.broadcast(ng))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("_ng")
                    / (F.col("_na").cast("double") * F.col("_nb"))
                ),
                round_decimals,
            ),
        )
        .select("item_a", "item_b", "n_ab", "pmi")
    )


def feature_scaling_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    quantize_decimals: int = 6,
) -> DataFrame:
    """Per-dimension mean and sample std of a vector column — the fit step
    of a standard scaler (the transform is a broadcast of these 2·dim
    numbers into a map-side expression).

    Elements are quantized to ``quantize_decimals`` first, then Σx and Σx²
    accumulate as DECIMAL — exact and order-independent, so the fitted
    stats are bit-stable across partitionings and engines (float feature
    sums are not; quantization is part of the declared semantics). One
    posexplode + one dim-keyed aggregate with map-side combine — the
    shuffle carries ``dim`` cells per partition, not the vectors."""
    v = F.round(F.col("_v").cast("double"), quantize_decimals)
    ex = df.select(F.posexplode(F.col(vec_col)).alias("dim", "_v")).select(
        (F.col("dim") + 1).cast("int").alias("dim"), v.alias("_q")
    )
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_q").cast("decimal(38,12)")).cast("double").alias("_sx"),
            F.sum((F.col("_q") * F.col("_q")).cast("decimal(38,12)"))
            .cast("double")
            .alias("_sxx"),
        )
        .select(
            "dim",
            F.round(F.col("_sx") / F.col("_n"), 6).alias("mean"),
            F.round(
                F.sqrt(
                    F.greatest(
                        (F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_n"))
                        / F.nullif(F.col("_n") - 1, F.lit(0)),
                        F.lit(0.0),
                    )
                ),
                6,
            ).alias("std"),
            F.col("_n").cast("bigint").alias("n"),
        )
    )


def rfm_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    n_bins: int = 5,
) -> DataFrame:
    """RFM segmentation — recency / frequency / monetary quantile scores
    per customer, the classic value-segmentation feature triple (score 5 =
    most recent / most frequent / highest spend under the usual
    convention).

    One groupBy collapses the events to per-key aggregates (monetary sums
    DECIMAL — exact and order-independent); the reference instant is the
    dataset's max timestamp kept in-plan (1-row aggregate cross-joined
    broadcast). Scores are deterministic ntiles with the key as tie-break,
    each computed by the bucket-parallel ``ranks.bucketed_ntile`` (exact
    global ntile semantics, hash-equal to the global-sort oracle) — at
    10⁹ customers the per-key table never serializes through one window
    task; the three scores are three independent bucketed passes."""
    from .ranks import bucketed_ntile

    per = df.groupBy(key_col).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(
            F.sum(F.col(amount_col).cast("decimal(28,6)")).cast("double"), 2
        ).alias("monetary"),
    )
    ref = df.agg(F.max(ts_col).alias("_ref"))
    per = per.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        F.floor(
            (F.unix_micros(F.col("_ref")) - F.unix_micros(F.col("_last")))
            / F.lit(86400000000.0)
        ).cast("bigint"),
    )
    k = F.col(key_col)
    per = per.select(key_col, "recency_days", "frequency", "monetary")
    tot = per.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    scored = bucketed_ntile(
        per,
        "recency_days",
        [F.col("recency_days").desc(), k],
        n_bins,
        "r_score",
        descending_bucket=True,
        total=tot,
    )
    scored = bucketed_ntile(
        scored, "frequency", [F.col("frequency").asc(), k], n_bins, "f_score", total=tot
    )
    scored = bucketed_ntile(
        scored, "monetary", [F.col("monetary").asc(), k], n_bins, "m_score", total=tot
    )
    return scored.select(
        key_col,
        "recency_days",
        "frequency",
        "monetary",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
    )


def woe_encoding(
    df: DataFrame,
    cat_col: str,
    label: Column,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding of a categorical against a binary
    target: WOE(c) = ln( (pos_c/POS) / (neg_c/NEG) ) with additive
    smoothing — the credit-scoring/risk staple (monotone in the event
    rate, comparable across categories, the input to IV feature
    ranking). Returns one row per category with counts, WOE, and its
    information-value contribution (p_pos − p_neg)·WOE; Σ iv is the
    feature's predictive-power score.

    Rows with a NULL label are excluded (unknowable, not negative).
    One count aggregate + a broadcast 1-row total — all integer counts,
    the two ratios and the single ln run in double and round(6), so the
    encoding table is engine-exact and (being a table) joins back onto
    any corpus as a broadcast map-side enrichment.
    """
    # NULL labels are EXCLUDED (a NULL target is unknowable, not negative
    # — counting it as negative would bias WOE on any nullable label)
    per = (
        df.select(F.col(cat_col).alias("_c"), label.cast("int").alias("_y"))
        .filter(F.col("_y").isNotNull())
        .groupBy("_c")
        .agg(
            F.sum("_y").cast("long").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("n_neg"),
        )
    )
    tot = per.agg(
        F.sum("n_pos").cast("double").alias("_P"),
        F.sum("n_neg").cast("double").alias("_N"),
    )
    sm = float(smoothing)
    p_pos = (F.col("n_pos") + sm) / (F.col("_P") + 2 * sm)
    p_neg = (F.col("n_neg") + sm) / (F.col("_N") + 2 * sm)
    woe = F.log(p_pos / p_neg)
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("_c").alias(cat_col),
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((p_pos - p_neg) * woe, 6).alias("iv_term"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    grid: int = 1000,
    out_col: str = "qnorm",
) -> DataFrame:
    """Quantile normalization of a value column across groups (the
    microarray-era standard, Bolstad et al. 2003, at grid resolution):
    every row maps to the POOLED distribution's value at its
    within-group quantile u = (rank − 0.5)/n, so all groups share one
    marginal distribution afterwards — the cross-group drift killer for
    heterogeneous feature sources.

    Scale shape: the reference curve is ONE aggregate row of grid+1
    pooled percentiles (built as a single SQL string — the driver-side
    py4j rule) cross-joined broadcast; ranks are per-group windows
    (groups are the partitions); the grid lookup is element_at. No
    global rank, no per-row join against pooled order statistics. Ties
    order by ``id_col`` (stable, engine-portable); equal inputs in one
    group may map to adjacent grid values — the standard stable-sort QN
    convention.
    """
    from pyspark.sql import Window

    # full-precision fractions: %.6f-style formatting silently truncates
    # grids that don't divide 10^6 (e.g. grid=3 → 0.333333), biasing the
    # probed quantiles; repr() round-trips the exact double
    pcts = ",".join(repr(i / grid) for i in range(grid + 1))
    ref = df.agg(
        F.expr(f"percentile({value_col}, array({pcts}))").alias("_ref")
    )
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    wg = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    )
    idx = (
        F.round((F.col("_r") - 0.5) / F.col("_n") * grid, 0).cast("int") + 1
    )
    return ranked.crossJoin(F.broadcast(ref)).select(
        id_col,
        group_col,
        value_col,
        F.round(F.element_at(F.col("_ref"), idx), 6).alias(out_col),
    )
