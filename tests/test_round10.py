"""Round-10 additions: ADVICE fixes (cochran_q duplicate-cell guard,
t_closeness categorical EMD, avro truncate_millis escape hatch) plus the
round's new operators."""

import pytest


def test_cochran_q_duplicate_cell_block_excluded(spark):
    """A block with a DUPLICATED (block, treatment) cell masking a missing
    treatment has row-count == k but countDistinct < k — it must be
    excluded, not double-counted into R_i / C_j (ADVICE r9)."""
    from pipes_spark.operators.profiling import cochran_q

    data = {
        "b1": {"t1": 1, "t2": 0, "t3": 0},
        "b2": {"t1": 1, "t2": 1, "t3": 0},
        "b3": {"t1": 1, "t2": 0, "t3": 1},
        "b4": {"t1": 0, "t2": 0, "t3": 0},
        "b5": {"t1": 1, "t2": 1, "t3": 1},
        "b6": {"t1": 1, "t2": 0, "t3": 0},
    }
    rows = [(b, t, x) for b, ts in data.items() for t, x in ts.items()]
    base = cochran_q(
        spark.createDataFrame(rows, ["b", "t", "x"]), "b", "t", "x"
    ).collect()[0]

    # b7 has t1 twice and no t3: 3 rows (== k) but only 2 distinct
    # treatments — the pre-fix filter admitted it
    poisoned = rows + [("b7", "t1", 1), ("b7", "t1", 1), ("b7", "t2", 0)]
    got = cochran_q(
        spark.createDataFrame(poisoned, ["b", "t", "x"]), "b", "t", "x"
    ).collect()[0]
    assert got["n_blocks"] == 6
    assert got["q_stat"] == base["q_stat"]


def test_t_closeness_categorical_mode_label_invariant(spark):
    """ordered=False computes the equal-distance EMD 0.5*sum|p-q| — the
    paper's categorical metric — and is invariant under label renaming,
    which the ordered (ordinal) default is deliberately not."""
    from pipes_spark.operators.profiling import t_closeness

    rows = [
        ("g1", "a"), ("g1", "a"), ("g1", "c"), ("g1", "c"),
        ("g2", "b"), ("g2", "b"), ("g2", "b"), ("g2", "b"),
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r["g"]: r["emd"]
        for r in t_closeness(df, ["g"], "v", t=0.1, ordered=False).collect()
    }
    # global q = (a:2, b:4, c:2)/8 = (.25, .5, .25)
    # g1 p = (.5, 0, .5): 0.5*(|.25|+|.5|+|.25|) = 0.5; g2 likewise
    assert got == {"g1": 0.5, "g2": 0.5}

    # rename 'a' -> 'z' (now sorts LAST): categorical emd unchanged,
    # ordinal emd changes — demonstrating exactly the documented caveat
    from pyspark.sql import functions as F

    df2 = df.withColumn("v", F.when(F.col("v") == "a", "z").otherwise(F.col("v")))
    got2 = {
        r["g"]: r["emd"]
        for r in t_closeness(df2, ["g"], "v", t=0.1, ordered=False).collect()
    }
    assert got2 == got
    ord1 = {
        r["g"]: r["emd"] for r in t_closeness(df, ["g"], "v", t=0.1).collect()
    }
    ord2 = {
        r["g"]: r["emd"] for r in t_closeness(df2, ["g"], "v", t=0.1).collect()
    }
    assert ord1 != ord2  # the ordinal default is label-order sensitive


def test_avro_truncate_millis_escape_hatch(tmp_path):
    """timestamp-millis with sub-ms precision: default raises loudly,
    truncate_millis=True floors to the millisecond (ADVICE r9)."""
    from datetime import datetime

    from pipes_spark.sources.avro import _iter_range_rows, write_avro_file

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            }
        ],
    }
    v = datetime(2024, 3, 1, 12, 0, 0, 123456)  # 456 us below the ms
    p = str(tmp_path / "a.avro")
    with pytest.raises(ValueError, match="sub-millisecond"):
        write_avro_file(p, schema, [{"ts": v}], codec="null")
    write_avro_file(p, schema, [{"ts": v}], codec="null", truncate_millis=True)
    ((got,),) = list(_iter_range_rows(p, 0, 10**9))
    assert got.replace(tzinfo=None) == datetime(2024, 3, 1, 12, 0, 0, 123000)
