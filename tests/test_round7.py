"""Round-7 additions: bucket-parallel grouped-map z-score."""

import pandas as pd
from pyspark.sql import functions as F

from pipes_spark.operators.udfs import grouped_zscore


def _events(spark):
    rows = [
        # user 1: plain group
        (1, 1, 10.0),
        (1, 2, 20.0),
        (1, 3, 30.0),
        # user 2: single row -> sd undefined -> zscore 0.0
        (2, 4, 7.0),
        # user 3: constant values -> sd == 0 -> zscore 0.0
        (3, 5, 5.0),
        (3, 6, 5.0),
        # user 4: two rows
        (4, 7, 1.0),
        (4, 8, 3.0),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, value double"
    )


def test_grouped_zscore_matches_per_key_form(spark):
    """The bucketed grouped-map (hash-bucket key + vectorized
    groupby-transform inside the batch) is bit-identical to grouping by the
    raw key: same rows, same zscores, for every bucket count including the
    degenerate 1-bucket case (everything in one pandas batch)."""
    ev = _events(spark)
    expected = {
        r.event_id: r.zscore
        for r in grouped_zscore(ev, n_buckets=1).collect()
    }
    # exact values, independently derived: ddof=1 std, sd<=0 -> 0.0
    assert expected[1] == -1.0 and expected[3] == 1.0 and expected[2] == 0.0
    assert expected[4] == 0.0  # singleton group
    assert expected[5] == 0.0 and expected[6] == 0.0  # zero variance
    for n in (2, 8, 64):
        got = {
            r.event_id: r.zscore for r in grouped_zscore(ev, n_buckets=n).collect()
        }
        assert got == expected, n


def test_grouped_zscore_default_buckets_from_conf(spark):
    """Default bucket count follows spark.sql.shuffle.partitions, and the
    output schema carries no bucket column."""
    out = grouped_zscore(_events(spark))
    assert out.columns == ["user_id", "event_id", "value", "zscore"]
    assert out.count() == 8


def test_grouped_zscore_groups_span_arrow_batches(spark):
    """A group larger than one Arrow batch still z-scores as ONE group:
    pandas sees the whole bucket as a single DataFrame (applyInPandas
    concatenates; only the WithState variant streams chunk iterators)."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        n = 100
        ev = spark.createDataFrame(
            [(1, i, float(i)) for i in range(n)],
            "user_id bigint, event_id bigint, value double",
        )
        got = grouped_zscore(ev, n_buckets=4).orderBy("event_id").toPandas()
        s = pd.Series([float(i) for i in range(n)])
        exp = ((s - s.mean()) / s.std(ddof=1)).round(6)
        assert (got["zscore"].values == exp.values).all()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


# ---------------------------------------------------------------------------
# review fixes: NULL-p FDR totals, anchored lint markers, tie-parallel zipf
# ---------------------------------------------------------------------------


def test_fdr_bh_null_p_excluded_from_m(spark):
    """A NULL p-value holds no rank; m must count only ranked rows, so
    adjusted p-values are identical with and without NULL-p rows."""
    from pipes_spark.operators.profiling import fdr_bh

    rows = [(f"t{i}", (i + 1) / 10.0) for i in range(9)]
    clean = spark.createDataFrame(rows, "test string, p double")
    dirty = clean.unionByName(
        spark.createDataFrame([("t_null", None)], "test string, p double")
    )
    a = {r.test: (r.rank, r.p_adj) for r in fdr_bh(clean, "p", "test").collect()}
    b = {r.test: (r.rank, r.p_adj) for r in fdr_bh(dirty, "p", "test").collect()}
    assert a == b  # the NULL row neither appears nor inflates m


def test_window_lint_markers_are_anchored():
    """Bounded-stitch exemption matches the FULL attribute name and ONLY
    the reserved `_rkb`: a user column merely ending in `_rkb` (id_rkb)
    must still be flagged, and the collision-prone 1-letter `_b` marker
    retired in round 8 (ADVICE r7) must no longer exempt anything."""
    from tools.window_lint import unpartitioned_windows

    flagged = "Window [row_number() AS r#9], [id_rkb#123 ASC NULLS FIRST]"
    assert len(unpartitioned_windows(flagged)) == 1
    exempt = "Window [sum(c#1) AS s#2], [_rkb#44 ASC NULLS FIRST]"
    assert unpartitioned_windows(exempt) == []
    retired = "Window [sum(c#1) AS s#2], [_b#7 ASC NULLS FIRST]"
    assert len(unpartitioned_windows(retired)) == 1


def test_zipf_fit_tie_parallel_rank_matches_lexicographic(spark):
    """zipf_fit's hash-salted tie-tier rank must give the identical fit to
    the plain (freq desc, tok asc) global rank — the (rank, freq) multiset
    is permutation-invariant within a tier and linear_fit's sums are
    DECIMAL-quantized per row."""
    from pyspark.sql import Window as W

    from pipes_spark.operators.profiling import linear_fit
    from pipes_spark.operators.text import tokens, zipf_fit

    docs = spark.createDataFrame(
        [
            (1, "a a a a b b b c c d e f g h i j"),
            (2, "a b c d d e f g k l m n o p q r"),
            (3, "a b b c c c d e f s t u v w x y"),
        ],
        "doc_id bigint, text string",
    )
    got = zipf_fit(docs).collect()[0]
    counts = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.col("freq").desc(), F.col("tok").asc())),
    )
    exp = linear_fit(
        ranked,
        [],
        F.log(F.col("rank").cast("double")),
        F.log(F.col("freq").cast("double")),
    ).collect()[0]
    assert got.n_types == exp.n_points
    assert got.slope == exp.slope
    assert got.intercept == exp.intercept
    assert got.r2 == exp.r2


# ---------------------------------------------------------------------------
# new ranks helpers (bucketed_lag / bucketed_cummax) must EQUAL the global
# single-partition window forms row-for-row, including legitimately-NULL
# source values, all-in-one-bucket degenerate splits, and min/max duality
# ---------------------------------------------------------------------------


def _lag_table(spark):
    """Distinct order keys, NULL-bearing payloads, duplicate payload
    values — the shapes that would expose a boundary-handoff bug."""
    rows = []
    for i in range(211):
        v = None if i % 17 == 0 else float((i * 31) % 23)
        rows.append((i * 3 + (i % 2), v, i % 5))
    return spark.createDataFrame(rows, "k bigint, v double, g int")


def test_bucketed_lag_equals_global_window(spark):
    from pyspark.sql import Window as W

    from pipes_spark.operators.ranks import bucketed_lag

    df = _lag_table(spark)
    w = W.orderBy(F.col("k").asc())
    expect = {
        r.k: (r.pv, r.pg)
        for r in df.select(
            "k",
            F.lag("v").over(w).alias("pv"),
            F.lag("g").over(w).alias("pg"),
        ).collect()
    }
    for n in (1, 4, 16):
        got = {
            r.k: (r.pv, r.pg)
            for r in bucketed_lag(
                df, "k", {"pv": "v", "pg": "g"}, n_buckets=n
            ).collect()
        }
        assert got == expect, n


def test_bucketed_cummax_equals_global_window(spark):
    from pyspark.sql import Window as W

    from pipes_spark.operators.ranks import bucketed_cummax

    df = _lag_table(spark)
    for minimum in (False, True):
        for inclusive in (True, False):
            for descending in (False, True):
                oc = F.col("k").desc() if descending else F.col("k").asc()
                w = W.orderBy(oc).rowsBetween(
                    W.unboundedPreceding, 0 if inclusive else -1
                )
                ext = F.min("v") if minimum else F.max("v")
                expect = {
                    r.k: r.e
                    for r in df.select("k", ext.over(w).alias("e")).collect()
                }
                got = {
                    r.k: r.e
                    for r in bucketed_cummax(
                        df,
                        "k",
                        {"e": "v"},
                        minimum=minimum,
                        inclusive=inclusive,
                        descending=descending,
                        n_buckets=6,
                    ).collect()
                }
                assert got == expect, (minimum, inclusive, descending)


def test_bucketed_row_number_nan_order_values(spark):
    """NaN order keys must not corrupt the rank: Spark sorts NaN above all
    doubles, and with_value_buckets' split only needs to be MONOTONE for
    correctness (whatever bucket the NaNs land in, bucket order plus
    within-bucket order must still compose to the global rank)."""
    from pyspark.sql import Window as W

    from pipes_spark.operators.ranks import bucketed_row_number

    rows = [(i, float((i * 13) % 7)) for i in range(40)]
    rows += [(100 + i, float("nan")) for i in range(5)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    expect = {
        r.id: r.r
        for r in df.withColumn(
            "r", F.row_number().over(W.orderBy(F.col("v").asc(), F.col("id").asc()))
        ).collect()
    }
    got = {
        r.id: r.r
        for r in bucketed_row_number(
            df, "v", [F.col("v").asc(), F.col("id").asc()], "r", n_buckets=4
        ).collect()
    }
    assert got == expect


def test_fdr_by_is_bh_times_harmonic(spark):
    """BY = BH with the harmonic factor: on a clean p table the BY
    adjusted p must equal min(1, BH_envelope · c(m)) and is never less
    conservative than BH."""
    import math

    from pipes_spark.operators.profiling import fdr_bh, fdr_by

    rows = [(f"t{i}", (i * 37 % 19 + 1) / 25.0) for i in range(12)]
    df = spark.createDataFrame(rows, "test string, p double")
    m = len(rows)
    c = sum(round(1.0 / i, 12) for i in range(1, m + 1))
    bh = {r.test: r.p_adj for r in fdr_bh(df, "p", "test").collect()}
    by = {r.test: r.p_adj for r in fdr_by(df, "p", "test").collect()}
    assert set(by) == set(bh)
    for t in bh:
        assert by[t] >= bh[t]
    # spot-exact on the smallest p (envelope = its own q there)
    smallest = min(rows, key=lambda r: (r[1], r[0]))[0]
    # reconstruct: envelope at rank 1 is min over all ranks of p*m/rank*c
    qs = sorted((p, t) for t, p in rows)
    env = min(p * m / (i + 1) * c for i, (p, t) in enumerate(qs))
    assert abs(by[smallest] - round(min(env, 1.0), 6)) <= 1e-6


def test_holm_bonferroni_textbook(spark):
    """Golden step-down example (m=4): raw p (.01,.02,.03,.04) →
    Holm-adjusted (.04,.06,.06,.06) — the envelope both clamps and
    enforces monotonicity."""
    from pipes_spark.operators.profiling import fdr_bh, holm_bonferroni

    rows = [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04)]
    df = spark.createDataFrame(rows, "test string, p double")
    got = {r.test: r.p_adj for r in holm_bonferroni(df, "p", "test").collect()}
    assert got == {"a": 0.04, "b": 0.06, "c": 0.06, "d": 0.06}
    # FWER control is never more liberal than the FDR step-up
    bh = {r.test: r.p_adj for r in fdr_bh(df, "p", "test").collect()}
    assert all(got[t] >= bh[t] for t in got)
    # adjusted p is monotone in rank and never below raw p
    ordered = sorted(rows, key=lambda r: r[1])
    adj = [got[t] for t, _ in ordered]
    assert adj == sorted(adj)
    assert all(a >= p for (_, p), a in zip(ordered, adj))


def test_kaplan_meier_grouped_matches_pooled_per_segment(spark):
    """Each segment's curve from the grouped form must equal the pooled
    kaplan_meier run on that segment's rows alone."""
    from pipes_spark.operators.timeseries import kaplan_meier, kaplan_meier_grouped

    rows = []
    for g, durs in (("a", [2, 2, 5, 7, 7, 9]), ("b", [1, 3, 3, 3, 8])):
        for i, d in enumerate(durs):
            rows.append((g, d, i % 2))  # alternate event/censor
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    grouped = kaplan_meier_grouped(df, "duration", "event", "grp").collect()
    for g in ("a", "b"):
        pooled = {
            (r.duration): (r.n_risk, r.n_events, r.n_censored, r.survival)
            for r in kaplan_meier(
                df.filter(F.col("grp") == g), "duration", "event"
            ).collect()
        }
        got = {
            r.duration: (r.n_risk, r.n_events, r.n_censored, r.survival)
            for r in grouped
            if r.grp == g
        }
        assert got == pooled, g


def test_embedding_contamination_empty_benchmark_keeps_all_rows(spark):
    """A corpus vector with no benchmark counterpart must still come back
    (NULL max_cos, contaminated=false) — the annotate-then-filter contract."""
    from pipes_spark.operators.similarity import embedding_contamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    empty = corpus.filter(F.col("vec_id") < 0)
    got = embedding_contamination(corpus, empty, dim=2).collect()
    assert {r.id for r in got} == {1, 2}
    assert all(r.max_cos is None and r.contaminated is False for r in got)
    # self-only benchmark: the lone candidate is excluded, row still emitted
    self_only = embedding_contamination(
        corpus.filter(F.col("vec_id") == 1),
        corpus.filter(F.col("vec_id") == 1),
        dim=2,
    ).collect()
    assert len(self_only) == 1 and self_only[0].max_cos is None
    assert self_only[0].contaminated is False


def test_survival_family_excludes_null_durations(spark):
    """NULL durations are excluded from curve, risk sets, and totals —
    identically in the pooled, grouped, and Nelson-Aalen forms."""
    from pipes_spark.operators.timeseries import (
        kaplan_meier,
        kaplan_meier_grouped,
        nelson_aalen,
    )

    clean = spark.createDataFrame(
        [("a", 2, 1), ("a", 5, 0), ("a", 7, 1)],
        "grp string, duration int, event int",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("a", None, 1), ("a", None, 0)], "grp string, duration int, event int"
        )
    )
    for fn in (
        lambda d: kaplan_meier(d, "duration", "event"),
        lambda d: nelson_aalen(d, "duration", "event"),
        lambda d: kaplan_meier_grouped(d, "duration", "event", "grp"),
    ):
        a = sorted(map(tuple, fn(clean).collect()))
        b = sorted(map(tuple, fn(dirty).collect()))
        assert a == b


def test_rmst_grouped_matches_pooled_per_segment(spark):
    """Each segment's RMST from the grouped form equals the pooled rmst
    run on that segment's KM curve alone — including the tail rectangle
    when a curve ends before tau."""
    from pipes_spark.operators.timeseries import (
        kaplan_meier,
        kaplan_meier_grouped,
        rmst,
        rmst_grouped,
    )

    rows = []
    for g, durs in (("a", [2, 2, 5, 7, 7, 9]), ("b", [1, 3, 3, 3, 8])):
        for i, d in enumerate(durs):
            rows.append((g, d, i % 2))
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    kmg = kaplan_meier_grouped(df, "duration", "event", "grp")
    got = {r.grp: r.rmst for r in rmst_grouped(kmg, tau=20.0).collect()}
    for g in ("a", "b"):
        km = kaplan_meier(df.filter(F.col("grp") == g), "duration", "event")
        pooled = rmst(km, tau=20.0).collect()[0].rmst
        assert got[g] == pooled, g
