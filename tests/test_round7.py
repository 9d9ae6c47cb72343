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
