"""Round-3 operators: triangle counting, path transitions, incremental
aggregate maintenance, leakage-safe grouped splits, bounded-state
streaming dedup."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def test_triangle_count_golden(spark):
    from pipes_spark.operators.components import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a pendant 4-5
    # and an isolated edge 6-7 (no triangles)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(4, 5), (6, 7)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["vertex"]: r["n_triangles"] for r in triangle_count(df).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_direction_and_dup_invariant(spark):
    from pipes_spark.operators.components import triangle_count

    # same triangle declared with mixed directions and duplicate edges
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 2), (1, 3), (1, 3)], "src bigint, dst bigint"
    )
    got = {r["vertex"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_hub_star_has_none(spark):
    from pipes_spark.operators.components import triangle_count

    # star around 0: many wedges, zero triangles (the hub-degeneracy case
    # the degree-ordered orientation is built for)
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 30)], "src bigint, dst bigint"
    )
    assert triangle_count(df).count() == 0


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    from pipes_spark.operators.components import triangle_count

    rng = random.Random(7)
    verts = list(range(20))
    edges = sorted(
        {tuple(sorted(rng.sample(verts, 2))) for _ in range(60)}
    )
    eset = set(edges)
    expect: dict[int, int] = {}
    for a, b, c in itertools.combinations(verts, 3):
        if ((a, b) in eset) and ((b, c) in eset) and ((a, c) in eset):
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["vertex"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# path_transitions
# ---------------------------------------------------------------------------


def test_path_transitions_golden(spark):
    from pipes_spark.operators.relational import path_transitions

    rows = [
        # user 1: a -> b -> b -> c
        (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
        # user 2: a -> b
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "user bigint, seq bigint, t string").withColumn(
        "ts", F.timestamp_seconds(F.col("seq"))
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in path_transitions(df, "user", "ts", "t", "seq").collect()
    }
    assert got == {
        ("a", "b"): (2, 1.0),
        ("b", "b"): (1, 0.5),
        ("b", "c"): (1, 0.5),
    }


def test_path_transitions_tiebreak_determinism(spark):
    from pipes_spark.operators.relational import path_transitions

    # two events at the SAME timestamp: the tiebreak id fixes the order
    rows = [(1, 1, 10, "x"), (1, 2, 10, "y"), (1, 3, 20, "z")]
    df = spark.createDataFrame(
        rows, "user bigint, id bigint, sec bigint, t string"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in path_transitions(df, "user", "ts", "t", "id").collect()
    }
    assert got == {("x", "y"): 1, ("y", "z"): 1}


# ---------------------------------------------------------------------------
# incremental_agg_merge
# ---------------------------------------------------------------------------


def test_incremental_agg_matches_full_recompute(spark):
    from pipes_spark.operators.relational import incremental_agg_merge

    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], "k string, v double"
    )
    # delta touches an existing key ('a'), introduces a new one ('c'),
    # and leaves 'b' untouched
    delta = spark.createDataFrame(
        [("a", 1.0), ("c", 7.0), ("c", 3.0)], "k string, v double"
    )
    state = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    merged = incremental_agg_merge(
        state, delta, ["k"], count_col="n", sums=["v"], mins=["v"], maxs=["v"]
    )
    full = base.unionByName(delta).groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    got = {r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"]) for r in merged.collect()}
    want = {r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"]) for r in full.collect()}
    assert got == want
    assert got["b"] == (1, 5.0, 5.0, 5.0)  # untouched key carried through
    assert got["c"] == (2, 10.0, 3.0, 7.0)  # delta-only key appears


def test_incremental_agg_empty_delta_is_identity(spark):
    from pipes_spark.operators.relational import incremental_agg_merge

    base = spark.createDataFrame([("a", 2.0), ("b", 4.0)], "k string, v double")
    state = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("sum_v")
    )
    empty = spark.createDataFrame([], "k string, v double")
    merged = incremental_agg_merge(state, empty, ["k"], count_col="n", sums=["v"])
    got = {r["k"]: (r["n"], r["sum_v"]) for r in merged.collect()}
    assert got == {"a": (1, 2.0), "b": (1, 4.0)}


# ---------------------------------------------------------------------------
# grouped_split
# ---------------------------------------------------------------------------


def test_grouped_split_purity_and_stability(spark, sf_dir):
    from pipes_spark.operators.sampling import grouped_split
    from pipes_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    tagged = grouped_split(d, "source", 0.4, salt="t")
    # purity: no source appears in more than one split
    mixed = (
        tagged.groupBy("source")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert mixed == 0
    # stability: same decision under a different partitioning
    again = grouped_split(d.repartition(7), "source", 0.4, salt="t")
    a = {(r["doc_id"], r["split"]) for r in tagged.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in again.select("doc_id", "split").collect()}
    assert a == b
    # both splits are non-empty at this fraction on the testdata
    ks = {r["split"] for r in tagged.select("split").distinct().collect()}
    assert ks == {"train", "test"}


def test_grouped_split_fraction_bounds(spark):
    import pytest

    from pipes_spark.operators.sampling import grouped_split

    df = spark.createDataFrame([("x", 1)], "g string, v int")
    with pytest.raises(ValueError):
        grouped_split(df, "g", 1.5)


# ---------------------------------------------------------------------------
# stream_dedup_within_watermark
# ---------------------------------------------------------------------------


def test_stream_dedup_within_watermark_bounded_state(spark, tmp_path):
    """Cross-batch semantics: a duplicate inside the watermark horizon is
    dropped; after the watermark passes the first occurrence, the key's
    state is evicted and a later re-occurrence is admitted AGAIN (the
    bounded-state contract dropDuplicates cannot express)."""
    from pipes_spark.streaming import stream_dedup_within_watermark

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    admitted: list[str] = []
    base = 1_000_000

    def write_file(name, rows):
        spark.createDataFrame(rows, "k string, sec bigint").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        ).drop("sec").coalesce(1).write.mode("append").parquet(str(src))

    def drain():
        # a fresh availableNow run against the SAME checkpoint: the
        # watermark and dedup state recover from the checkpoint, new
        # files form the next micro-batch
        s = spark.readStream.schema("k string, ts timestamp").parquet(str(src))
        dd = stream_dedup_within_watermark(s, ["k"], "ts", "10 seconds")
        q = (
            dd.select("k")
            .writeStream.foreachBatch(
                lambda b, _i: admitted.extend(r["k"] for r in b.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: k1 twice inside the horizon (one admitted) + k2
    write_file("f0", [("k1", base), ("k1", base + 1), ("k2", base + 2)])
    drain()
    assert sorted(admitted) == ["k1", "k2"]

    # run 2: an unrelated key far in the future advances the watermark
    # past k1's state lifetime (base + 10s) -> k1's state is evicted
    write_file("f1", [("k3", base + 3600)])
    drain()
    assert sorted(admitted) == ["k1", "k2", "k3"]

    # run 3: k1 re-occurs after eviction and is admitted AGAIN
    write_file("f2", [("k1", base + 3700)])
    drain()
    assert sorted(admitted) == ["k1", "k1", "k2", "k3"]


# ---------------------------------------------------------------------------
# attribution
# ---------------------------------------------------------------------------


def test_attribution_golden(spark):
    from pipes_spark.operators.relational import attribution

    rows = [
        # user 1: click(1) view(2) purchase(3) -> last=view(2), first=click(1)
        (1, 1, 100, "click"),
        (1, 2, 200, "view"),
        (1, 3, 300, "purchase"),
        # user 2: click far in the past (outside 1000s lookback), purchase
        (2, 4, 100, "click"),
        (2, 5, 5000, "purchase"),
        # user 3: purchase with no touches at all
        (3, 6, 100, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "u bigint, id bigint, sec bigint, t string"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
    got = {
        r["conversion_id"]: (
            r["last_touch_id"],
            r["last_touch_type"],
            r["first_touch_id"],
            r["first_touch_type"],
        )
        for r in attribution(
            df, "u", "ts", "t", "id", "purchase", ["click", "view"], 1000
        ).collect()
    }
    assert got[3] == (2, "view", 1, "click")
    # outside lookback: last-touch null, first-touch (whole journey) kept
    assert got[5] == (None, None, 4, "click")
    assert got[6] == (None, None, None, None)


def test_attribution_never_self_or_simultaneous_later(spark):
    from pipes_spark.operators.relational import attribution

    # click at the SAME ts as the purchase but with a LATER id must not
    # receive credit; the same-ts earlier-id click must
    rows = [(1, 1, 100, "click"), (1, 2, 100, "purchase"), (1, 3, 100, "click")]
    df = spark.createDataFrame(
        rows, "u bigint, id bigint, sec bigint, t string"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
    got = attribution(
        df, "u", "ts", "t", "id", "purchase", ["click"], 1000
    ).collect()
    assert len(got) == 1 and got[0]["last_touch_id"] == 1


# ---------------------------------------------------------------------------
# fk_profile / skew_report
# ---------------------------------------------------------------------------


def test_fk_profile_golden_with_orphans(spark):
    from pipes_spark.operators.profiling import fk_profile

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,), (None,)], "k bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p bigint")
    r = fk_profile(child, "k", parent, "p", "c->p").collect()[0]
    assert r["relation"] == "c->p"
    assert r["n_child_rows"] == 6  # nulls excluded
    assert r["n_child_keys"] == 3
    assert r["n_parent_keys"] == 3
    assert r["n_matched_keys"] == 2
    assert abs(r["containment"] - round(2 / 3, 6)) < 1e-9
    assert r["n_orphan_rows"] == 3  # the three 9s


def test_skew_report_golden(spark):
    from pipes_spark.operators.profiling import skew_report

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r["key"], r["n"], r["share"], r["skew_rank"])
        for r in skew_report(df, "k", top_n=2)
        .orderBy("skew_rank")
        .collect()
    ]
    assert got == [("a", 6, 0.6, 1), ("b", 3, 0.3, 2)]


# ---------------------------------------------------------------------------
# knn_graph
# ---------------------------------------------------------------------------


def test_knn_graph_matches_bruteforce(spark):
    import numpy as np

    from pipes_spark.operators.similarity import knn_graph

    rng = np.random.default_rng(11)
    X = rng.normal(size=(40, 8))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    k, floor = 3, 0.2
    got = {
        (r["src"], r["knn_rank"]): r["dst"]
        for r in knn_graph(df, k=k, floor=floor, block_size=16).collect()
    }
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = np.round(Xn @ Xn.T, 6)
    expect = {}
    for i in range(40):
        nbrs = [
            (j, C[i, j]) for j in range(40) if j != i and C[i, j] >= floor
        ]
        nbrs.sort(key=lambda t: (-t[1], t[0]))
        for rank, (j, _) in enumerate(nbrs[:k], start=1):
            expect[(i, rank)] = j
    assert got == expect


# ---------------------------------------------------------------------------
# fuzzy_join_segments
# ---------------------------------------------------------------------------


def test_fuzzy_join_segments_golden(spark):
    from pipes_spark.operators.text import fuzzy_join_segments

    rows = [
        (1, "abcdef"),
        (2, "abcdeX"),   # distance 1 from 1
        (3, "abXdef"),   # distance 1 from 1
        (4, "XYZdef"),   # distance 3 from 1 — shares a segment, rejected
        (5, "abcdefg"),  # different length — never a candidate
        (6, "abcdef"),   # exact dup (distance 0) — excluded by contract
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_join_segments(df, "s", "id", max_distance=1).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 6): 1, (3, 6): 1}


def test_fuzzy_join_segments_finds_all_substitution_pairs(spark):
    import random

    from pipes_spark.operators.text import fuzzy_join_segments

    rng = random.Random(3)
    alpha = "0123456789abcdef"
    base = ["".join(rng.choice(alpha) for _ in range(10)) for _ in range(60)]
    rows = [(i, s) for i, s in enumerate(base)]
    # plant exactly one substitution-typo twin for every 4th string
    for i in range(0, 60, 4):
        s = base[i]
        p = i % 10
        rows.append((1000 + i, s[:p] + "z" + s[p + 1:]))
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_join_segments(df, "s", "id", max_distance=1).collect()
    }
    # brute force over all equal-length pairs
    def lev1(a, b):
        return len(a) == len(b) and sum(x != y for x, y in zip(a, b)) == 1

    expect = {
        (min(ia, ib), max(ia, ib))
        for i, (ia, sa) in enumerate(rows)
        for ib, sb in rows[i + 1:]
        if lev1(sa, sb)
    }
    assert expect  # the planted twins exist
    assert got == expect


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def test_label_propagation_separates_bridged_cliques(spark):
    from pipes_spark.operators.components import (
        connected_components,
        label_propagation,
    )

    # two 4-cliques {0..3} and {10..13} joined by ONE bridge edge 3-10
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges += [(3, 10)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    labels = {
        r["id"]: r["label"] for r in label_propagation(df, num_iter=5).collect()
    }
    # each clique converges to its own min-id label; the bridge does not merge
    assert {labels[v] for v in range(4)} == {0}
    assert {labels[v] for v in range(10, 14)} == {10}
    # contrast: pure connectivity merges them into one component
    cc = {
        r["id"]: r["component"]
        for r in connected_components(df.selectExpr("src as id_a", "dst as id_b")).collect()
    }
    assert len({cc[v] for v in list(range(4)) + list(range(10, 14))}) == 1


def test_label_propagation_deterministic_across_partitionings(spark):
    from pipes_spark.operators.components import label_propagation

    edges = [(i, (i * 7 + 3) % 20) for i in range(20)] + [(i, i + 1) for i in range(19)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = {(r["id"], r["label"]) for r in label_propagation(df, num_iter=4).collect()}
    b = {
        (r["id"], r["label"])
        for r in label_propagation(df.repartition(13), num_iter=4).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------


def test_time_weighted_avg_golden(spark):
    from pipes_spark.operators.timeseries import time_weighted_avg

    rows = [
        # user 1: 5.0 held for 10s, 10.0 held for 30s, final obs drops
        (1, 1, 0, 5.0),
        (1, 2, 10, 10.0),
        (1, 3, 40, 99.0),
        # user 2: all events at ONE timestamp -> zero span, twa NULL (not an error)
        (2, 4, 0, 1.0),
        (2, 5, 0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "u bigint, id bigint, sec bigint, v double"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
    got = {
        r["u"]: (r["twa"], r["span_seconds"], r["n_obs"])
        for r in time_weighted_avg(df, "u", "ts", "v", order_tiebreak="id").collect()
    }
    assert got[1] == (round((5 * 10 + 10 * 30) / 40, 6), 40.0, 3)
    assert got[2][0] is None and got[2][1] == 0.0


# ---------------------------------------------------------------------------
# quality_checks / ab_test
# ---------------------------------------------------------------------------


def test_quality_checks_golden(spark):
    from pipes_spark.operators.profiling import quality_checks

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, "z", -1.0), (None, "a", None)],
        "k bigint, s string, v double",
    )
    got = {
        (r["rule"], r["col_name"]): (r["violations"], r["passed"])
        for r in quality_checks(
            df,
            [
                ("not_null", "k"),
                ("unique", "k"),
                ("in_set", "s", ("a", "b")),
                ("in_range", "v", 0, 10),
            ],
        ).collect()
    }
    assert got[("not_null", "k")] == (1, False)
    # k values: 1, 2, 2, NULL -> one duplicated row beyond first
    assert got[("unique", "k")] == (1, False)
    assert got[("in_set", "s")] == (1, False)   # 'z'
    # v: 5 ok, 50 out, -1 out, NULL counts as violation
    assert got[("in_range", "v")] == (3, False)


def test_quality_checks_all_pass_and_bad_rule(spark):
    import pytest

    from pipes_spark.operators.profiling import quality_checks

    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    rows = quality_checks(df, [("not_null", "k"), ("unique", "k")]).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in rows)
    with pytest.raises(ValueError):
        quality_checks(df, [("no_such_rule", "k")])


def test_ab_test_matches_scipy_free_reference(spark):
    import math

    from pipes_spark.operators.profiling import ab_test

    a_vals = [1.0, 2.0, 3.0, 4.0]
    b_vals = [2.0, 4.0, 6.0]
    rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ab_test(df, "g", "v").collect()[0]
    ma = sum(a_vals) / len(a_vals)
    mb = sum(b_vals) / len(b_vals)
    va = sum((x - ma) ** 2 for x in a_vals) / (len(a_vals) - 1)
    vb = sum((x - mb) ** 2 for x in b_vals) / (len(b_vals) - 1)
    se = math.sqrt(va / len(a_vals) + vb / len(b_vals))
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert abs(r["mean_diff"] - round(mb - ma, 6)) < 1e-9
    assert abs(r["std_err"] - round(se, 6)) < 1e-9
    assert abs(r["t_stat"] - round((mb - ma) / se, 6)) < 1e-9


# ---------------------------------------------------------------------------
# stateful_trending_scores
# ---------------------------------------------------------------------------


def test_trending_scores_decay_closed_form_across_batches(spark, tmp_path):
    """The sequential fold telescopes to score = Σ 2^(−(t_last − t_i)/hl);
    batch boundaries must not change it."""
    import math

    from pipes_spark.streaming import stateful_trending_scores

    src = tmp_path / "src"
    src.mkdir()
    hl = 100.0
    base = 1_000_000

    def write(rows):
        spark.createDataFrame(rows, "k string, sec bigint").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        ).drop("sec").coalesce(1).write.mode("append").parquet(str(src))

    # batch 1: events at t=0, 50; batch 2: t=250
    write([("x", base), ("x", base + 50)])
    write([("x", base + 250)])
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = stateful_trending_scores(stream, "k", "ts", hl)
    rows = []
    q = (
        out.writeStream.foreachBatch(
            lambda b, i: rows.extend((i, r.asDict()) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    finals = [r for _, r in rows if r["n_events"] == 3]
    assert len(finals) == 1
    times = [0, 50, 250]
    expect = sum(math.pow(2.0, -(250 - t) / hl) for t in times)
    assert abs(finals[0]["score"] - round(expect, 6)) < 1e-6
    assert finals[0]["last_ts"].timestamp() == base + 250


# ---------------------------------------------------------------------------
# retrieval_metrics
# ---------------------------------------------------------------------------


def test_retrieval_metrics_golden(spark):
    from pipes_spark.operators.similarity import retrieval_metrics

    # q1: relevant {10, 11, 12}; retrieved [10, 99, 11] -> recall 2/3,
    #     mrr 1, dcg = 1/log2(2) + 1/log2(4), idcg(3) = 2.13093
    # q2: relevant {20}; retrieved [98, 97, 20] -> recall 1, mrr 1/3
    # q3: relevant {30}; retrieved [96, 95, 94] -> all zeros
    ranked = spark.createDataFrame(
        [
            (1, 10, 1), (1, 99, 2), (1, 11, 3),
            (2, 98, 1), (2, 97, 2), (2, 20, 3),
            (3, 96, 1), (3, 95, 2), (3, 94, 3),
        ],
        "query_id bigint, neighbor_id bigint, rank bigint",
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (3, 30)],
        "query_id bigint, neighbor_id bigint",
    )
    import math

    r = retrieval_metrics(ranked, truth, k=3).collect()[0]
    assert r["n_queries"] == 3
    exp_recall = (round(2 / 3, 6) + 1.0 + 0.0) / 3
    assert abs(r["recall_at_3"] - round(exp_recall, 6)) < 1e-9
    exp_mrr = (1.0 + round(1 / 3, 6) + 0.0) / 3
    assert abs(r["mrr_at_3"] - round(exp_mrr, 6)) < 1e-9
    idcg3 = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    q1_ndcg = round((1 / math.log2(2) + 1 / math.log2(4)) / idcg3, 6)
    q2_ndcg = round((1 / math.log2(4)) / 1.0, 6)
    exp_ndcg = (q1_ndcg + q2_ndcg + 0.0) / 3
    assert abs(r["ndcg_at_3"] - round(exp_ndcg, 6)) < 1e-6


def test_retrieval_metrics_perfect_ranking_is_one(spark):
    from pipes_spark.operators.similarity import retrieval_metrics

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id bigint, neighbor_id bigint, rank bigint"
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 11)], "query_id bigint, neighbor_id bigint"
    )
    r = retrieval_metrics(ranked, truth, k=2).collect()[0]
    assert (r["recall_at_2"], r["mrr_at_2"], r["ndcg_at_2"]) == (1.0, 1.0, 1.0)


# ---------------------------------------------------------------------------
# k_core
# ---------------------------------------------------------------------------


def test_k_core_golden(spark):
    from pipes_spark.operators.components import k_core

    # triangle {1,2,3} + pendant 3-4 + path 5-6: 2-core = the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["vertex"]: r["core_degree"] for r in k_core(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_matches_python_peel(spark):
    import random

    from pipes_spark.operators.components import k_core

    rng = random.Random(5)
    verts = list(range(30))
    edges = sorted({tuple(sorted(rng.sample(verts, 2))) for _ in range(90)})
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    k = 4
    # reference peel
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    expect = {v: len(ns) for v, ns in adj.items() if ns}
    got = {r["vertex"]: r["core_degree"] for r in k_core(df, k).collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# mmr_rerank
# ---------------------------------------------------------------------------


def test_mmr_lambda_one_is_relevance_order(spark):
    import numpy as np

    from pipes_spark.operators.similarity import cosine_topk, mmr_rerank

    rng = np.random.default_rng(2)
    X = rng.normal(size=(30, 6))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    mmr = mmr_rerank(df, q, k=5, pool=10, lambda_=1.0)
    plain = cosine_topk(df, q, k=5)
    a = [(r["neighbor_id"]) for r in mmr.orderBy("mmr_rank").collect()]
    b = [(r["neighbor_id"]) for r in plain.orderBy("rank").collect()]
    assert a == b


def test_mmr_demotes_near_duplicate(spark):
    from pipes_spark.operators.similarity import mmr_rerank

    # query along x; candidates: A ~ x (best), A' ≈ A (near-dup),
    # B = diverse but still relevant. MMR at λ=0.5 must pick A then B.
    rows = [
        (0, [1.0, 0.0, 0.0]),          # the query itself
        (1, [0.99, 0.1, 0.0]),         # A
        (2, [0.985, 0.11, 0.0]),       # A' near-dup of A
        (3, [0.7, 0.0, 0.7]),          # B diverse
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    got = [
        r["neighbor_id"]
        for r in mmr_rerank(df, q, k=2, pool=3, lambda_=0.5)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert got == [1, 3]


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------


def test_interval_overlap_join_matches_bruteforce(spark):
    import random

    from pipes_spark.operators.relational import interval_overlap_join

    rng = random.Random(9)
    left = [(i, rng.randint(0, 500), rng.randint(1, 80)) for i in range(40)]
    right = [(j, rng.randint(0, 500), rng.randint(1, 80)) for j in range(30)]
    ldf = spark.createDataFrame(
        [(i, lo, lo + w) for i, lo, w in left], "lid bigint, l_lo bigint, l_hi bigint"
    )
    rdf = spark.createDataFrame(
        [(j, lo, lo + w) for j, lo, w in right], "rid bigint, r_lo bigint, r_hi bigint"
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "l_lo", "l_hi", "r_lo", "r_hi", bin_width=50.0
        ).collect()
    }
    expect = {
        (i, j)
        for i, llo, lw in left
        for j, rlo, rw in right
        if llo < rlo + rw and rlo < llo + lw
    }
    assert got == expect


# ---------------------------------------------------------------------------
# features: target encoding / hashing trick
# ---------------------------------------------------------------------------


def test_target_encode_loo_golden(spark):
    from pipes_spark.operators.features import target_encode_loo

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 5.0)],
        "cat string, y double",
    )
    got = {
        (r["cat"], r["y"]): r["te"]
        for r in target_encode_loo(df, "cat", "y").collect()
    }
    # leave-one-out means exclude the own row
    assert got[("a", 10.0)] == 25.0
    assert got[("a", 20.0)] == 20.0
    assert got[("a", 30.0)] == 15.0
    # singleton category has no peers -> NULL (no leakage-prone self-mean)
    assert got[("b", 5.0)] is None


def test_feature_hash_deterministic_and_bounded(spark):
    from pipes_spark.operators.features import feature_hash

    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "alpha gamma")], "doc_id bigint, text string"
    )
    rows = feature_hash(df, "text", "doc_id", num_features=8).collect()
    got = {(r["doc_id"], r["bucket"]): r["count"] for r in rows}
    assert all(0 <= b < 8 for _, b in got)
    # same token -> same bucket in both docs; beta counted twice in doc 1
    alpha_buckets = {b for (d, b), c in got.items() if c >= 1}
    again = {
        (r["doc_id"], r["bucket"]): r["count"]
        for r in feature_hash(df.repartition(5), "text", "doc_id", 8).collect()
    }
    assert got == again
    assert sum(c for (d, _), c in got.items() if d == 1) == 3


# ---------------------------------------------------------------------------
# stateful_threshold_alerts
# ---------------------------------------------------------------------------


def test_threshold_alerts_edge_triggered_across_batches(spark, tmp_path):
    """One 'raised' per upward crossing even when the value stays above
    across a batch boundary; 'recovered' on the downward crossing."""
    from pipes_spark.streaming import stateful_threshold_alerts

    src = tmp_path / "src"
    src.mkdir()
    base = 1_000_000

    def write(rows):
        spark.createDataFrame(rows, "k string, sec bigint, v double").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        ).drop("sec").coalesce(1).write.mode("append").parquet(str(src))

    # batch 1: below, above (raise), above (no repeat)
    write([("x", base, 10.0), ("x", base + 1, 90.0), ("x", base + 2, 95.0)])
    # batch 2: still above (no repeat), below (recover), above (raise again)
    write([("x", base + 3, 80.0), ("x", base + 4, 5.0), ("x", base + 5, 99.0)])
    stream = (
        spark.readStream.schema("k string, v double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    alerts = stateful_threshold_alerts(stream, "k", "ts", "v", 50.0)
    rows = []
    q = (
        alerts.writeStream.foreachBatch(
            lambda b, i: rows.extend(r.asDict() for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    seq = [(r["alert"], r["value"]) for r in sorted(rows, key=lambda r: r["ts"])]
    assert seq == [("raised", 90.0), ("recovered", 5.0), ("raised", 99.0)]


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs / asof_join_nearest / fd rule
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_finds_adjacent_typos(spark):
    from pipes_spark.operators.text import sorted_neighborhood_pairs

    rows = [
        (1, "apple0001"),
        (2, "apple0002"),   # distance 1 from 1 — sorts adjacent
        (3, "banana0001"),
        (4, "banana0002"),  # distance 1 from 3
        (5, "cherry0009"),  # no partner
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in sorted_neighborhood_pairs(df, "s", "id", window=2).collect()
    }
    assert got == {(1, 2): 1, (3, 4): 1}


def test_sorted_neighborhood_window_bounds_candidates(spark):
    from pipes_spark.operators.text import sorted_neighborhood_pairs

    # identical-distance pair separated by > window rows in sort order is
    # missed — the documented recall knob (window=1 here)
    rows = [(1, "aa"), (2, "ab"), (3, "ac"), (4, "ad")]
    df = spark.createDataFrame(rows, "id bigint, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "s", "id", window=1).collect()
    }
    # only rank-adjacent pairs survive
    assert got == {(1, 2), (2, 3), (3, 4)}


def test_asof_nearest_matches_pandas(spark):
    import pandas as pd

    from pipes_spark.operators.relational import asof_join_nearest

    left = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "g": ["a", "a", "a", "b"],
            "t": [10.0, 25.0, 40.0, 5.0],
        }
    )
    right = pd.DataFrame(
        {"g": ["a", "a", "b"], "t": [12.0, 30.0, 100.0], "v": [1.0, 2.0, 3.0]}
    )
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="g",
        direction="nearest",
    ).sort_values("id")
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (
        asof_join_nearest(ldf, rdf, on="t", by=["g"], value_cols=["v"], id_col="id")
        .orderBy("id")
        .collect()
    )
    assert [r["asof_v"] for r in got] == list(want["v"])


def test_quality_fd_rule_golden(spark):
    from pipes_spark.operators.profiling import quality_checks

    df = spark.createDataFrame(
        [("k1", "x"), ("k1", "x"), ("k2", "x"), ("k2", "y"), ("k3", "z")],
        "a string, b string",
    )
    rows = {
        r["col_name"]: (r["violations"], r["passed"])
        for r in quality_checks(df, [("fd", "a", "b")]).collect()
    }
    # k2 maps to two b values -> one extra dependent
    assert rows["a->b"] == (1, False)


# ---------------------------------------------------------------------------
# psi_drift
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from pyspark.sql import functions as SF

    from pipes_spark.operators.profiling import psi_drift

    df = spark.range(0, 2000).select((SF.col("id") % 100).cast("double").alias("v"))
    rows = psi_drift(df, df, "v", n_bins=10).collect()
    total = sum(r["psi_contrib"] for r in rows)
    assert abs(total) < 1e-6
    assert len(rows) == 10


def test_psi_detects_shift(spark):
    from pyspark.sql import functions as SF

    from pipes_spark.operators.profiling import psi_drift

    ref = spark.range(0, 2000).select((SF.col("id") % 100).cast("double").alias("v"))
    cur = spark.range(0, 2000).select(
        ((SF.col("id") % 100) + 50).cast("double").alias("v")
    )
    rows = psi_drift(ref, cur, "v", n_bins=10).collect()
    total = sum(r["psi_contrib"] for r in rows)
    assert total > 0.25  # "shifted" by the standard rule of thumb
    # mass left the low reference bins and piled into the top one
    bymap = {r["bin"]: r for r in rows}
    assert bymap[1]["n_cur"] == 0 and bymap[10]["n_cur"] > bymap[10]["n_ref"]
