"""Round-6 tests: bucket-parallel global ordering primitives (ranks.py)
proven equal to the single-partition window forms, plus regression tests
for the round-5 advisory fixes (Mann-Kendall n=1 series, isotonic
non-string group keys, NULL-ordered streaming upserts, full-precision
quantile grids)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ranks.py — bucketed forms must EQUAL the global-window forms row-for-row
# ---------------------------------------------------------------------------


def _skewed_values(spark):
    """Value table with heavy ties, skewed spacing, and negatives — the
    shapes that would expose a boundary-straddling-ties bug."""
    rows = [(i, float((i * 7919) % 97) / 3.0 - 11.0) for i in range(500)]
    rows += [(500 + i, 42.0) for i in range(73)]  # one hot value
    return spark.createDataFrame(rows, "id bigint, v double")


def test_bucketed_cumsum_equals_global_window(spark):
    from pipes_spark.operators.ranks import bucketed_cumsum

    per = (
        _skewed_values(spark)
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    for inclusive in (False, True):
        for descending in (False, True):
            oc = F.col("v").desc() if descending else F.col("v").asc()
            w = Window.orderBy(oc).rowsBetween(
                Window.unboundedPreceding, 0 if inclusive else -1
            )
            expect = {
                r["v"]: r["cum"]
                for r in per.select(
                    "v", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum")
                ).collect()
            }
            got = {
                r["v"]: r["cum"]
                for r in bucketed_cumsum(
                    per,
                    "v",
                    {"cum": "c"},
                    inclusive=inclusive,
                    descending=descending,
                    n_buckets=7,
                ).collect()
            }
            assert got == expect, (inclusive, descending)


def test_bucketed_row_number_equals_global_window(spark):
    from pipes_spark.operators.ranks import bucketed_row_number

    df = _skewed_values(spark)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    expect = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    got = {
        r["id"]: r["_rn"]
        for r in bucketed_row_number(
            df, "v", [F.col("v").asc(), F.col("id").asc()], n_buckets=5
        ).collect()
    }
    assert got == expect


def test_bucketed_row_number_descending_bucket(spark):
    from pipes_spark.operators.ranks import bucketed_row_number

    df = _skewed_values(spark)
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    expect = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    got = {
        r["id"]: r["_rn"]
        for r in bucketed_row_number(
            df,
            "v",
            [F.col("v").desc(), F.col("id").asc()],
            descending_bucket=True,
            n_buckets=5,
        ).collect()
    }
    assert got == expect


@pytest.mark.parametrize("n_bins", [1, 3, 5, 7, 700])
def test_bucketed_ntile_equals_spark_ntile(spark, n_bins):
    """Exact ntile parity including n % k != 0 and n < k (n_bins=700 over
    573 rows: every row its own tile)."""
    from pipes_spark.operators.ranks import bucketed_ntile

    df = _skewed_values(spark)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    expect = {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(n_bins).over(w).alias("t")).collect()
    }
    got = {
        r["id"]: r["t"]
        for r in bucketed_ntile(
            df, "v", [F.col("v").asc(), F.col("id").asc()], n_bins, "t", n_buckets=6
        ).collect()
    }
    assert got == expect


def test_bucketed_helpers_degenerate_single_bucket(spark):
    """n_buckets=1 is the single-partition A/B baseline and must still be
    exact."""
    from pipes_spark.operators.ranks import bucketed_row_number

    df = _skewed_values(spark)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    expect = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    got = {
        r["id"]: r["_rn"]
        for r in bucketed_row_number(
            df, "v", [F.col("v").asc(), F.col("id").asc()], n_buckets=1
        ).collect()
    }
    assert got == expect


def test_bucketed_plan_has_no_unpartitioned_big_window(spark):
    """The stitched plan's only unpartitioned window is over the tiny
    per-bucket offset table (ordered by the bucket id `_rkb`, bounded by
    n_buckets), never over the data. Parses the Window nodes' top-level
    bracket groups — an unpartitioned Window prints only (exprs, order),
    a partitioned one (exprs, partition, order) — via tools/window_lint;
    the round-6 regex form was vacuous (optimized plans never contain the
    literal 'partitionBy', so its assert branch never ran)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.window_lint import unpartitioned_windows, window_nodes

    from pipes_spark.operators.ranks import bucketed_row_number

    df = _skewed_values(spark)
    plan = bucketed_row_number(
        df, "v", [F.col("v").asc(), F.col("id").asc()], n_buckets=8
    )._jdf.queryExecution().optimizedPlan().toString()
    nodes = window_nodes(plan)
    # non-vacuous: the plan has both window shapes — the partitioned
    # within-bucket rank and the _rkb-ordered bounded offset stitch
    assert any(len(g) == 3 for g in nodes), plan
    assert any(len(g) == 2 for g in nodes), plan
    # ...and the ONLY unpartitioned ones are the bounded stitches
    assert unpartitioned_windows(plan) == [], plan
    # prove the detector bites: the plain global form must be flagged
    from pyspark.sql import Window as W

    bad = df.withColumn(
        "r", F.row_number().over(W.orderBy(F.col("v").asc()))
    )._jdf.queryExecution().optimizedPlan().toString()
    assert len(unpartitioned_windows(bad)) == 1, bad


# ---------------------------------------------------------------------------
# advisory fixes
# ---------------------------------------------------------------------------


def test_mann_kendall_keeps_single_observation_series(spark):
    """A key with one observation has no i<j pairs; it must report
    S=0/var=0/z=0 instead of vanishing from the output."""
    from pipes_spark.operators.profiling import mann_kendall_trend

    rows = [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("lone", 1, 5.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {r["k"]: r for r in mann_kendall_trend(df, "k", "t", "v").collect()}
    assert set(out) == {"a", "lone"}
    assert out["lone"]["n_points"] == 1
    assert out["lone"]["s_stat"] == 0
    assert out["lone"]["var_s"] == 0.0
    assert out["lone"]["z"] == 0.0
    assert out["a"]["s_stat"] == 3  # strictly increasing: all pairs +1


def test_isotonic_calibration_int_group_key(spark):
    """A non-string group column must round-trip through the Arrow
    boundary with its own type (the hardcoded-'string' regression)."""
    from pipes_spark.operators.linear_model import isotonic_calibration

    rows = [(m, float(i) / 10.0, 1 if i > 5 else 0) for m in (1, 2) for i in range(10)]
    df = spark.createDataFrame(rows, "model_id int, score double, y int")
    out = isotonic_calibration(df, "score", F.col("y"), group_col="model_id")
    assert dict(out.dtypes)["model_id"] == "int"
    rows_out = out.collect()
    assert len(rows_out) == 20
    # calibrated probabilities are monotone in score within each group
    for m in (1, 2):
        seq = [
            r["calibrated"]
            for r in sorted(
                (r for r in rows_out if r["model_id"] == m),
                key=lambda r: r["_score"],
            )
        ]
        assert all(a <= b + 1e-12 for a, b in zip(seq, seq[1:]))


def test_quantile_normalize_small_grid_exact_fractions(spark):
    """grid=4 probes exact quarters; with %.6f truncation the 0.25/0.75
    probes would drift off the exact interpolated percentiles."""
    from pipes_spark.operators.features import quantile_normalize

    rows = [("g1", float(i), i) for i in range(1, 6)] + [
        ("g2", float(10 * i), 10 + i) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g string, v double, id int")
    out = quantile_normalize(df, "g", "v", "id", grid=4)
    vals = {(r["g"], r["id"]): r["qnorm"] for r in out.collect()}
    # both groups have identical within-group ranks, so after QN the two
    # groups carry IDENTICAL value multisets (the defining property)
    g1 = sorted(v for (g, _), v in vals.items() if g == "g1")
    g2 = sorted(v for (g, _), v in vals.items() if g == "g2")
    assert g1 == g2


def test_streaming_upsert_null_order_key_replaceable(spark, tmp_path):
    """A row inserted with a NULL order key must be replaced by a later
    row for the same key that carries a real order key (the NULL struct
    comparison previously pinned the target forever)."""
    from pipes_spark.streaming import streaming_upsert_writer

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    table = "t_round6_upsert_nullord"
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    schema = "k int, ord int, val string"
    # batch 1: NULL order key
    spark.createDataFrame([(1, None, "first")], schema).write.mode(
        "overwrite"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    streaming_upsert_writer(
        stream, table, keys=["k"], order_cols=["ord"], checkpointLocation=ckpt
    )
    # batch 2: same key, real order key — must WIN
    spark.createDataFrame([(1, 7, "second")], schema).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_upsert_writer(
        stream, table, keys=["k"], order_cols=["ord"], checkpointLocation=ckpt
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["val"] == "second" and rows[0]["ord"] == 7
    spark.sql(f"DROP TABLE IF EXISTS {table}")
