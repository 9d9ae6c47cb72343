"""Round-4 operators: multi-source BFS shortest paths, exact ROC AUC,
chi-square independence, deterministic shard export, incremental MinHash
ingest dedup."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shortest_paths
# ---------------------------------------------------------------------------


def test_shortest_paths_chain_golden(spark):
    from pipes_spark.operators.components import shortest_paths

    # chain 1-2-3-4-5 plus a disconnected edge 8-9
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r.vertex, r.landmark): r.distance
        for r in shortest_paths(df, [1], max_hops=6).collect()
    }
    assert got == {(1, 1): 0, (2, 1): 1, (3, 1): 2, (4, 1): 3, (5, 1): 4}


def test_shortest_paths_hop_cap_and_multi_source(spark):
    from pipes_spark.operators.components import shortest_paths

    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r.vertex, r.landmark): r.distance
        for r in shortest_paths(df, [1, 5], max_hops=2).collect()
    }
    # vertex 4 is 3 hops from 1 (beyond cap) but 1 hop from 5
    assert got == {
        (1, 1): 0, (2, 1): 1, (3, 1): 2,
        (5, 5): 0, (4, 5): 1, (3, 5): 2,
    }


def test_shortest_paths_picks_min_over_multiple_routes(spark):
    from pipes_spark.operators.components import shortest_paths

    # 1-2-4 and 1-3-4 plus direct 1-4: distance(4)=1, not 2
    edges = [(1, 2), (2, 4), (1, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.vertex: r.distance for r in shortest_paths(df, [1], max_hops=4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 1}


# ---------------------------------------------------------------------------
# auc_roc
# ---------------------------------------------------------------------------


def test_auc_golden_with_ties(spark):
    from pipes_spark.operators.linear_model import auc_roc

    rows = [(1.0, 0), (2.0, 0), (3.0, 1), (2.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = auc_roc(df, F.col("y") == 1, F.col("s")).collect()[0]
    # pos {3,2,4} vs neg {1,2}: 5 wins + 1 tie of 6 pairs
    assert r.auc == round((5 + 0.5) / 6, 6)
    assert (r.n_pos, r.n_neg) == (3, 2)


def test_auc_perfect_and_inverted(spark):
    from pipes_spark.operators.linear_model import auc_roc

    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, y int")
    assert auc_roc(df, F.col("y") == 1, F.col("s")).collect()[0].auc == 1.0
    assert auc_roc(df, F.col("y") == 0, F.col("s")).collect()[0].auc == 0.0


def test_auc_single_class_is_null(spark):
    from pipes_spark.operators.linear_model import auc_roc

    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
    assert auc_roc(df, F.col("y") == 1, F.col("s")).collect()[0].auc is None


# ---------------------------------------------------------------------------
# chi_square
# ---------------------------------------------------------------------------


def test_chi_square_golden_2x2(spark):
    from pipes_spark.operators.profiling import chi_square

    rows = (
        [("A", "x")] * 10 + [("A", "y")] * 20 + [("B", "x")] * 20 + [("B", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square(df, F.col("a"), F.col("b")).collect()[0]
    # all expected cells are 15: chi2 = 4 * 25/15 = 6.666667
    assert r.chi2 == round(4 * 25 / 15, 6)
    assert r.dof == 1
    assert r.n == 60


def test_chi_square_independent_is_zero(spark):
    from pipes_spark.operators.profiling import chi_square

    # perfectly proportional table -> statistic exactly 0
    rows = [("A", "x")] * 6 + [("A", "y")] * 2 + [("B", "x")] * 12 + [("B", "y")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square(df, F.col("a"), F.col("b")).collect()[0]
    assert r.chi2 == 0.0


# ---------------------------------------------------------------------------
# shard assignment / export
# ---------------------------------------------------------------------------


def test_shard_assignment_sizes_and_coverage(spark, sf_dir):
    from pipes_spark.operators.sampling import shard_assignment
    from pipes_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    s = shard_assignment(docs, "doc_id", 64)
    sizes = {r.shard: r.c for r in s.groupBy("shard").agg(F.count("*").alias("c")).collect()}
    last = max(sizes)
    assert all(sizes[k] == 64 for k in sizes if k != last)
    assert sizes[last] == n - 64 * last
    # positions within each shard are exactly 0..size-1
    pos_ok = s.groupBy("shard").agg(
        F.min("shard_pos").alias("lo"),
        F.max("shard_pos").alias("hi"),
        F.count_distinct("shard_pos").alias("d"),
        F.count("*").alias("c"),
    )
    assert pos_ok.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("c") - 1) | (F.col("d") != F.col("c"))
    ).isEmpty()


def test_shard_assignment_partitioning_invariant_and_salted(spark, sf_dir):
    from pipes_spark.operators.sampling import shard_assignment
    from pipes_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in shard_assignment(docs, "doc_id", 64).collect()
    }
    b = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in shard_assignment(docs.repartition(7), "doc_id", 64).collect()
    }
    assert a == b
    c = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in shard_assignment(docs, "doc_id", 64, salt="epoch2").collect()
    }
    assert {t[0] for t in c} == {t[0] for t in a}  # same rows
    assert c != a  # different permutation


def test_write_training_shards_one_ordered_file_per_shard(spark, sf_dir, tmp_path):
    from pipes_spark.operators.sampling import shard_assignment
    from pipes_spark.sinks import write_training_shards
    from pipes_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = str(tmp_path / "shards")
    write_training_shards(out, "doc_id", 128)(docs)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    expected = shard_assignment(docs, "doc_id", 128)
    n_shards = expected.agg(F.max("shard")).collect()[0][0] + 1
    assert len(dirs) == n_shards
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    # file order is permutation order, content matches the assignment
    got = spark.read.parquet(out)
    gset = {(r.doc_id, r.shard, r.shard_pos) for r in got.collect()}
    eset = {(r.doc_id, r.shard, r.shard_pos) for r in expected.collect()}
    assert gset == eset


# ---------------------------------------------------------------------------
# incremental MinHash ingest
# ---------------------------------------------------------------------------


def test_incremental_signatures_equal_full_rebuild(spark, sf_dir):
    from pipes_spark.operators.dedup import _minhash_wide, incremental_signature_ingest
    from pipes_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    sigs_old = _minhash_wide(old, "doc_id", "text", 64, 3)
    inc = incremental_signature_ingest(sigs_old, new)
    full = _minhash_wide(docs, "doc_id", "text", 64, 3)
    assert inc.exceptAll(full).isEmpty() and full.exceptAll(inc).isEmpty()
    # re-ingesting already-present docs is a no-op (anti-join guard)
    again = incremental_signature_ingest(inc, docs)
    assert again.count() == docs.count()


def test_delta_pairs_equal_full_pairs_touching_batch(spark, sf_dir):
    from pipes_spark.operators.dedup import (
        _minhash_wide,
        minhash_lsh_pairs,
        minhash_lsh_pairs_delta,
    )
    from pipes_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    sigs = _minhash_wide(docs, "doc_id", "text", 64, 3)
    full = minhash_lsh_pairs(docs, sigs=sigs, threshold=0.5)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    expected = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in full.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    }
    got = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in minhash_lsh_pairs_delta(sigs, new.select("doc_id"), threshold=0.5).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# calibration_bins
# ---------------------------------------------------------------------------


def test_calibration_bins_golden(spark):
    from pipes_spark.operators.linear_model import calibration_bins

    # 2 bins of 3: low scores (0.1,0.2,0.3) with 1 positive, high
    # (0.7,0.8,0.9) with 3 positives
    rows = [
        (0.1, 0, 1), (0.2, 1, 2), (0.3, 0, 3),
        (0.7, 1, 4), (0.8, 1, 5), (0.9, 1, 6),
    ]
    df = spark.createDataFrame(rows, "s double, y int, k int")
    got = {
        r.bin: (r.n_rows, r.avg_score, r.pos_rate)
        for r in calibration_bins(
            df, F.col("y") == 1, F.col("s"), F.col("k"), n_bins=2
        ).collect()
    }
    assert got == {
        1: (3, round(0.6 / 3, 6), round(1 / 3, 6)),
        2: (3, round(2.4 / 3, 6), 1.0),
    }


# ---------------------------------------------------------------------------
# id_islands
# ---------------------------------------------------------------------------


def test_id_islands_golden(spark):
    from pipes_spark.operators.profiling import id_islands

    df = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 10]], "id long")
    got = {
        (r.island_start, r.island_end, r.n_ids)
        for r in id_islands(df, "id").collect()
    }
    assert got == {(1, 3, 3), (7, 8, 2), (10, 10, 1)}


def test_id_islands_single_run_and_partitioning_invariant(spark):
    from pipes_spark.operators.profiling import id_islands

    df = spark.createDataFrame([(i,) for i in range(5, 25)], "id long")
    got = id_islands(df.repartition(8), "id").collect()
    assert [(r.island_start, r.island_end, r.n_ids) for r in got] == [(5, 24, 20)]


# ---------------------------------------------------------------------------
# oov_stats
# ---------------------------------------------------------------------------


def test_oov_stats_golden(spark):
    from pipes_spark.operators.text import oov_stats

    rows = [
        ("a", "x x x y"),       # with vocab {x,y}: 0 OOV of 4
        ("b", "x z z"),         # 2 OOV of 3
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in oov_stats(df, "text", "source", vocab_size=2).collect()
    }
    # corpus counts: x=4, z=2, y=1 -> vocab {x, z}
    assert got == {"a": (4, 1, 0.25), "b": (3, 0, 0.0)}


# ---------------------------------------------------------------------------
# padding_report
# ---------------------------------------------------------------------------


def test_padding_report_golden(spark):
    from pipes_spark.operators.packing import padding_report

    df = spark.createDataFrame([(3,), (5,), (10,), (12,)], "l long")
    got = {
        r.bucket: (r.n_rows, r.max_len, r.total_len, r.padding, r.pad_frac)
        for r in padding_report(df, "l", bucket_width=8).collect()
    }
    assert got == {
        0: (2, 5, 8, 2, 0.2),          # lens 3,5: pad = 2*5-8
        1: (2, 12, 22, 2, round(2 / 24, 6)),  # lens 10,12
    }


# ---------------------------------------------------------------------------
# k_anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_golden(spark):
    from pipes_spark.operators.profiling import k_anonymity

    rows = [("us", "a")] * 5 + [("us", "b")] * 2 + [("fr", "a")] * 1
    df = spark.createDataFrame(rows, "nation string, seg string")
    got = {
        (r.nation, r.seg): r.n_rows
        for r in k_anonymity(df, ["nation", "seg"], k=5).collect()
    }
    assert got == {("us", "b"): 2, ("fr", "a"): 1}


# ---------------------------------------------------------------------------
# pmi_pairs
# ---------------------------------------------------------------------------


def test_pmi_pairs_golden(spark):
    import math

    from pipes_spark.operators.features import pmi_pairs

    # 4 groups: x&y together twice, x alone once, z with x once
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "x"), (4, "z"),
    ]
    df = spark.createDataFrame(rows, "g int, i string")
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.pmi)
        for r in pmi_pairs(df, "g", "i").collect()
    }
    # N=4, n_x=4, n_y=2, n_z=1
    assert got == {
        ("x", "y"): (2, round(math.log(2 * 4 / (4 * 2)), 6)),
        ("x", "z"): (1, round(math.log(1 * 4 / (4 * 1)), 6)),
    }


# ---------------------------------------------------------------------------
# feature_scaling_stats
# ---------------------------------------------------------------------------


def test_feature_scaling_golden_and_partitioning_invariant(spark):
    import statistics

    from pipes_spark.operators.features import feature_scaling_stats

    vecs = [([1.0, 10.0],), ([2.0, 20.0],), ([3.0, 30.0],)]
    df = spark.createDataFrame(vecs, "embedding array<float>")
    got = {
        r.dim: (r.mean, r.std, r.n)
        for r in feature_scaling_stats(df, "embedding").collect()
    }
    assert got == {
        1: (2.0, round(statistics.stdev([1, 2, 3]), 6), 3),
        2: (20.0, round(statistics.stdev([10, 20, 30]), 6), 3),
    }
    rep = {
        r.dim: (r.mean, r.std, r.n)
        for r in feature_scaling_stats(df.repartition(5), "embedding").collect()
    }
    assert rep == got


# ---------------------------------------------------------------------------
# shard_manifest
# ---------------------------------------------------------------------------


def test_shard_manifest_order_independent_and_content_sensitive(spark, sf_dir):
    from pipes_spark.operators.sampling import shard_assignment, shard_manifest
    from pipes_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sharded = shard_assignment(docs, "doc_id", 100)
    a = {
        (r.shard, r.n_rows, r.content_digest)
        for r in shard_manifest(sharded, ["doc_id", "n_chars"]).collect()
    }
    b = {
        (r.shard, r.n_rows, r.content_digest)
        for r in shard_manifest(sharded.repartition(11), ["doc_id", "n_chars"]).collect()
    }
    assert a == b  # digest independent of partitioning / row order
    mutated = sharded.withColumn(
        "n_chars", F.when(F.col("doc_id") == 0, F.col("n_chars") + 1).otherwise(F.col("n_chars"))
    )
    c = {
        (r.shard, r.n_rows, r.content_digest)
        for r in shard_manifest(mutated, ["doc_id", "n_chars"]).collect()
    }
    assert c != a  # a single-row change flips exactly one shard digest
    assert len(a - c) == 1


# ---------------------------------------------------------------------------
# rfm_scores / forecast_backtest
# ---------------------------------------------------------------------------


def test_rfm_golden(spark):
    import datetime

    from pipes_spark.operators.features import rfm_scores

    d = datetime.datetime
    rows = [
        (1, d(2024, 1, 1), 10.0), (1, d(2024, 1, 10), 10.0),   # stale, 2 buys
        (2, d(2024, 1, 20), 100.0),                            # recent, big
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    got = {
        r.u: (r.recency_days, r.frequency, r.monetary, r.r_score, r.f_score, r.m_score)
        for r in rfm_scores(df, "u", "ts", "v", n_bins=2).collect()
    }
    assert got == {
        1: (10, 2, 20.0, 1, 2, 1),   # 10 days stale -> low R; 2 buys -> high F
        2: (0, 1, 100.0, 2, 1, 2),   # bought "today" -> high R; high spend -> high M
    }


def test_forecast_backtest_perfect_linear_has_zero_error(spark):
    import datetime

    from pipes_spark.operators.timeseries import forecast_backtest

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", base + datetime.timedelta(days=i), 2.0 * i + 5.0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    cut = F.lit("2024-01-06 00:00:00").cast("timestamp")
    r = forecast_backtest(df, ["k"], "ts", "v", cut).collect()[0]
    assert r.n_test == 5
    assert r.mape == 0.0 and r.mae == 0.0


# ---------------------------------------------------------------------------
# function_sink (Python DataSource writer)
# ---------------------------------------------------------------------------


def test_function_sink_runs_per_partition_executor_side(spark, tmp_path):
    import json
    import uuid as _uuid

    from pipes_spark.sources.generator import function_sink

    out = str(tmp_path / "fn_sink")
    os.makedirs(out, exist_ok=True)

    def sink(rows):
        path = os.path.join(out, f"part-{_uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps({"id": r[0]}) + "\n")

    function_sink(spark.range(100).repartition(4), sink)
    files = glob.glob(os.path.join(out, "*.jsonl"))
    assert len(files) == 4  # one invocation per partition
    ids = []
    for p in files:
        with open(p) as f:
            ids += [json.loads(line)["id"] for line in f]
    assert sorted(ids) == list(range(100))


# ---------------------------------------------------------------------------
# hard_negatives / next_event_eval
# ---------------------------------------------------------------------------


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from pipes_spark.operators.similarity import hard_negatives

    vecs = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.14], 0),   # same label as 1 -> never its negative
        (3, [0.9, 0.44], 1),    # closest other-label to 1
        (4, [0.0, 1.0], 1),     # far from 1
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    got = {
        (r.anchor_id, r.neg_rank): r.negative_id
        for r in hard_negatives(df, "label", k=2, floor=-1.0).collect()
    }
    assert got[(1, 1)] == 3 and got[(1, 2)] == 4
    assert 2 not in {got[(1, 1)], got[(1, 2)]}
    # symmetric direction: 3's hard negatives are the label-0 vectors
    assert got[(3, 1)] == 2  # cos(3,2) > cos(3,1)


def test_next_event_eval_golden(spark):
    import datetime

    from pipes_spark.operators.relational import next_event_eval

    d = datetime.datetime
    # train: a->b twice, a->c once  => predict b after a
    rows = [
        (1, d(2024, 1, 1, 0), "a", 1), (1, d(2024, 1, 1, 1), "b", 2),
        (1, d(2024, 1, 2, 0), "a", 3), (1, d(2024, 1, 2, 1), "b", 4),
        (2, d(2024, 1, 3, 0), "a", 5), (2, d(2024, 1, 3, 1), "c", 6),
        # test: a->b (hit), a->c (miss)
        (3, d(2024, 2, 1, 0), "a", 7), (3, d(2024, 2, 1, 1), "b", 8),
        (4, d(2024, 2, 2, 0), "a", 9), (4, d(2024, 2, 2, 1), "c", 10),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, t string, e long")
    cut = F.lit("2024-02-01 00:00:00").cast("timestamp")
    got = {
        r.from_type: (r.n_test, r.n_hit, r.hit_rate)
        for r in next_event_eval(df, "u", "ts", "t", "e", cut).collect()
    }
    assert got == {"a": (2, 1, 0.5)}


# ---------------------------------------------------------------------------
# incremental_agg_retract
# ---------------------------------------------------------------------------


def test_incremental_retract_matches_recompute_and_drops_empty_keys(spark):
    from pipes_spark.operators.relational import incremental_agg_retract

    base = [("a", 10.0), ("a", 20.0), ("b", 5.0)]
    state = (
        spark.createDataFrame(base, "k string, v double")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("sum_val"),
        )
    )
    # retract both of b's rows? b only has one -> retract it (key drops),
    # retract a's 10, insert c
    delta = spark.createDataFrame(
        [("b", 5.0, -1), ("a", 10.0, -1), ("c", 7.0, 1)],
        "k string, val double, op int",
    )
    got = {
        r.k: (r.n, float(r.sum_val))
        for r in incremental_agg_retract(state, delta, ["k"]).collect()
    }
    assert got == {"a": (1, 20.0), "c": (1, 7.0)}  # b gone entirely


# ---------------------------------------------------------------------------
# exact_dedup_best / cusum
# ---------------------------------------------------------------------------


def test_exact_dedup_best_keeps_highest_score(spark):
    from pipes_spark.operators.dedup import exact_dedup_best

    rows = [
        (1, "the same doc", 12),
        (2, "THE  same   DOC", 15),   # same fingerprint, higher score
        (3, "something else", 14),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    kept = sorted(r.doc_id for r in exact_dedup_best(df, F.col("n_chars")).collect())
    assert kept == [2, 3]


def test_cusum_matches_sequential_recursion(spark):
    import datetime

    from pipes_spark.operators.timeseries import cusum

    base = datetime.datetime(2024, 1, 1)
    vals = [1.0, 5.0, 5.0, 0.0, 6.0, 6.0, 6.0, 0.0]
    rows = [("k", base + datetime.timedelta(minutes=i), float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, i long")
    got = [
        r.cusum
        for r in cusum(df, ["k"], "ts", "v", target=3.0, slack=0.5, threshold=4.0,
                       tiebreak_col="i").orderBy("i").collect()
    ]
    s, expected = 0.0, []
    for v in vals:
        s = max(0.0, s + v - 3.0 - 0.5)
        expected.append(round(s, 6))
    assert got == expected
    alerts = [
        r.alert
        for r in cusum(df, ["k"], "ts", "v", target=3.0, slack=0.5, threshold=4.0,
                       tiebreak_col="i").orderBy("i").collect()
    ]
    assert alerts == [e > 4.0 for e in expected]


# ---------------------------------------------------------------------------
# warehouse signature append (ingest lifecycle)
# ---------------------------------------------------------------------------


def test_append_minhash_signatures_idempotent(spark, sf_dir):
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import append_minhash_signatures, minhash_signature_table

    # num_hashes=32 keys a SEPARATE managed table, so this append never
    # pollutes the default (64-hash) table other tests and queries read
    base = minhash_signature_table(spark, sf_dir, num_hashes=32)
    n0 = base.count()
    batch = (
        load_table(spark, sf_dir, "documents")
        .limit(10)
        .select((F.col("doc_id") + 20_000_000).alias("doc_id"), "text")
    )
    t1 = append_minhash_signatures(spark, sf_dir, batch, num_hashes=32)
    assert t1.count() == n0 + 10
    # re-append is a no-op (anti-join guard)
    t2 = append_minhash_signatures(spark, sf_dir, batch, num_hashes=32)
    assert t2.count() == n0 + 10
    assert t2.filter(F.col("doc_id") >= 20_000_000).count() == 10


def test_streaming_cusum_carries_state_across_batches(spark, tmp_path):
    import datetime

    from pipes_spark.streaming import run_to_memory, stateful_cusum

    d = datetime.datetime
    schema = "k string, ts timestamp, v double, i long"
    src = str(tmp_path / "cusum_src")
    os.makedirs(src, exist_ok=True)
    # batch 1: values push S to 5; batch 2 continues FROM 5, not from 0
    b1 = [("k", d(2024, 1, 1, 0, m), float(v), m) for m, v in enumerate([3.0, 4.0])]
    b2 = [("k", d(2024, 1, 1, 1, m), float(v), 10 + m) for m, v in enumerate([1.0, 6.0])]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "f1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = stateful_cusum(
        stream, "k", "ts", "v", target=1.0, slack=0.0, threshold=6.0, tiebreak_col="i"
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "f2")
    )
    got = run_to_memory(out, output_mode="append").orderBy("i").collect()
    # python recursion over ALL rows in order: 2, 5, 5, 10
    vals = [3.0, 4.0, 1.0, 6.0]
    s, expected = 0.0, []
    for v in vals:
        s = max(0.0, s + v - 1.0)
        expected.append(s)
    assert [r.cusum for r in got] == expected
    assert [r.alert for r in got] == [e > 6.0 for e in expected]


def test_progress_summary_reports_batches_and_state(spark, sf_dir):
    import uuid as _uuid

    from pipes_spark.sources import load_table
    from pipes_spark.streaming import progress_summary

    # small watermarked stateful stream to a memory sink
    import tempfile

    path = f"{sf_dir}/events.parquet"
    d = tempfile.mkdtemp(prefix="prog_")
    os.symlink(path, os.path.join(d, "events.parquet"))
    schema = load_table(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(schema).parquet(d)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    name = f"prog_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    summary = progress_summary(q)
    assert summary, "expected at least one progress entry"
    data_batches = [s for s in summary if s["num_input_rows"]]
    assert data_batches and all(s["batch_duration_ms"] is not None for s in summary)
    assert any(
        st["state_rows"] is not None for s in summary for st in s["state"]
    ), "stateful operator metrics missing"


def test_dedup_rate_report_internally_consistent(spark, sf_dir):
    from pipes_spark.catalog import QUERIES

    r = QUERIES["dedup_rate_report"].fn(spark, sf_dir).collect()[0]
    assert r.n_docs > 0
    assert 0 <= r.n_exact_dup_rows < r.n_docs
    # every near-dup loser belongs to a cluster that also has a canonical
    assert r.n_near_dup_losers >= r.n_dup_clusters >= 0 or r.n_near_dup_losers == 0
    assert r.unique_frac == round((r.n_docs - r.n_near_dup_losers) / r.n_docs, 6)
    # exact dups are a subset of near-dup losers at threshold<=1 (an exact
    # dup pair has jaccard 1.0), so the near count can't be smaller
    assert r.n_near_dup_losers >= r.n_exact_dup_rows


# ---------------------------------------------------------------------------
# benford_audit / zipf_fit
# ---------------------------------------------------------------------------


def test_benford_golden_shares_and_exclusions(spark):
    import math

    from pipes_spark.operators.profiling import benford_audit

    rows = [(1.5,), (12.0,), (19.9,), (25.0,), (0.4,)]  # 0.4 excluded
    df = spark.createDataFrame(rows, "v double")
    got = {r.digit: (r.n, r.share) for r in benford_audit(df, "v").collect()}
    # the 1-9 spine is always complete; absent digits carry n=0
    assert set(got) == set(range(1, 10))
    assert got[1] == (3, 0.75) and got[2] == (1, 0.25)
    assert all(got[d] == (0, 0.0) for d in range(3, 10))
    # an absent digit still contributes its full (0-E)^2/E = E to chi2
    by_digit = {r.digit: r for r in benford_audit(df, "v").collect()}
    e9 = math.log10(1 + 1 / 9) * 4
    assert by_digit[9].chi2_part == round(e9, 6)


def test_zipf_fit_recovers_planted_power_law(spark):
    import math

    from pipes_spark.operators.text import zipf_fit

    # corpus where token t_r appears round(100/r) times: slope ~= -1
    words = []
    for r in range(1, 9):
        words += [f"w{r:02d}"] * round(100 / r)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    row = zipf_fit(df).collect()[0]
    assert row.n_types == 8
    assert abs(row.slope + 1.0) < 0.05  # near the Zipf exponent
    assert row.r2 > 0.99


# ---------------------------------------------------------------------------
# mann_whitney_u / theil_sen_slope
# ---------------------------------------------------------------------------


def test_mann_whitney_golden_with_ties(spark):
    from pipes_spark.operators.profiling import mann_whitney_u

    # group1 = [3, 2, 4], group0 = [1, 2]: same data as the AUC golden
    rows = [(1.0, 0), (2.0, 0), (3.0, 1), (2.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "v double, g int")
    r = mann_whitney_u(df, F.col("g") == 1, F.col("v")).collect()[0]
    # ranks: 1->1, 2->2.5 (tie), 3->4, 4->5; R1 = 2.5+4+5 = 11.5
    # U1 = 11.5 - 3*4/2 = 5.5 ; matches AUC*n1*n2 = 0.916667*6
    assert (r.n1, r.n2) == (3, 2)
    assert r.u1 == 5.5
    # z: mean 3, tie-corrected var = 6/12*((5+1) - 6/(5*4)) = 2.85
    import math

    assert r.z == round((5.5 - 3.0) / math.sqrt(2.85), 6)


def test_theil_sen_ignores_outlier_ols_cannot(spark):
    from pipes_spark.operators.profiling import linear_fit, theil_sen_slope

    # y = 2x line with one wild outlier at the end
    rows = [(i, float(i), 2.0 * i) for i in range(30)] + [(99, 30.0, 500.0)]
    df = spark.createDataFrame(rows, "k long, x double, y double")
    ts = theil_sen_slope(
        df, F.col("x"), F.col("y"), F.col("k"), sample_fraction=1.0
    ).collect()[0]
    assert ts.n_sample == 31
    assert abs(ts.slope_ts - 2.0) < 0.1  # robust: median slope stays on the line
    ols = linear_fit(df, [], F.col("x"), F.col("y")).collect()[0]
    assert ols.slope > 2.5  # OLS dragged far off by the single outlier


# ---------------------------------------------------------------------------
# ks_two_sample / gini_coefficient
# ---------------------------------------------------------------------------


def test_ks_golden_separated_and_identical(spark):
    from pipes_spark.operators.profiling import ks_two_sample

    # fully separated distributions -> D = 1
    rows = [(1.0, 1), (2.0, 1), (10.0, 0), (11.0, 0)]
    df = spark.createDataFrame(rows, "v double, g int")
    r = ks_two_sample(df, F.col("g") == 1, F.col("v")).collect()[0]
    assert (r.n1, r.n2, r.ks_d) == (2, 2, 1.0)
    # identical samples -> D = 0
    rows2 = [(1.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)]
    df2 = spark.createDataFrame(rows2, "v double, g int")
    assert ks_two_sample(df2, F.col("g") == 1, F.col("v")).collect()[0].ks_d == 0.0


def test_gini_extremes(spark):
    from pipes_spark.operators.profiling import gini_coefficient

    # perfectly equal -> 0
    eq = spark.createDataFrame([(i, 10.0) for i in range(5)], "k long, y double")
    assert gini_coefficient(eq, F.col("y"), F.col("k")).collect()[0].gini == 0.0
    # one unit holds everything -> (n-1)/n = 0.8
    one = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)], "k long, y double"
    )
    assert gini_coefficient(one, F.col("y"), F.col("k")).collect()[0].gini == 0.8


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from pipes_spark.operators.profiling import bootstrap_mean_ci

    rows = [(i, float(10 + (i * 7) % 13)) for i in range(120)]
    df = spark.createDataFrame(rows, "k long, y double")
    r1 = bootstrap_mean_ci(df, F.col("y"), F.col("k"), n_replicates=100).collect()[0]
    assert r1.n == 120 and r1.n_replicates == 100
    assert r1.ci_lo <= r1.mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi  # non-degenerate interval
    # determinism across partitionings (hash draws, no RNG state)
    r2 = bootstrap_mean_ci(
        df.repartition(7), F.col("y"), F.col("k"), n_replicates=100
    ).collect()[0]
    assert (r1.mean, r1.ci_lo, r1.ci_hi) == (r2.mean, r2.ci_lo, r2.ci_hi)


def test_prob_metrics_golden(spark):
    import math

    from pipes_spark.operators.linear_model import prob_metrics

    rows = [(0.9, 1), (0.1, 0), (0.8, 0), (0.3, 1)]
    df = spark.createDataFrame(rows, "p double, y int")
    r = prob_metrics(df, F.col("y") == 1, F.col("p")).collect()[0]
    lls = [
        round(-math.log(0.9), 6), round(-math.log(0.9), 6),
        round(-math.log(0.2), 6), round(-math.log(0.3), 6),
    ]
    brs = [round(x, 6) for x in (0.01, 0.01, 0.64, 0.49)]
    assert r.n == 4
    assert r.log_loss == round(sum(lls) / 4, 6)
    assert r.brier == round(sum(brs) / 4, 6)


def test_permutation_test_separated_vs_identical(spark):
    from pipes_spark.operators.profiling import permutation_test_mean_diff

    # hugely separated groups: p should be the minimum (1/(R+1))
    rows = [(i, float(i % 7), 0) for i in range(40)] + [
        (100 + i, 100.0 + (i % 7), 1) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k long, y double, g int")
    r = permutation_test_mean_diff(
        df, F.col("g") == 1, F.col("y"), F.col("k"), n_permutations=50
    ).collect()[0]
    assert (r.n, r.n_a) == (80, 40)
    assert r.p_value == round(1 / 51, 6)
    # identical groups (same multiset): obs diff 0 -> p = 1 (every
    # permutation is at least as extreme)
    same = [(i, float(i % 5), i % 2) for i in range(40)]
    df2 = spark.createDataFrame(same, "k long, y double, g int")
    r2 = permutation_test_mean_diff(
        df2, F.col("g") == 1, F.col("y"), F.col("k"), n_permutations=50
    ).collect()[0]
    assert r2.p_value > 0.5


def test_kaplan_meier_matches_hand_computation_with_censoring(spark):
    from pipes_spark.operators.timeseries import kaplan_meier

    # durations: deaths at t=1 (2 of 10), censor 1 at t=2, deaths at t=3
    # (3 of 7), censor 2 at t=4, deaths at t=5 (2 of 2) -> S hits 0
    rows = (
        [(1, 1)] * 2 + [(2, 0)] + [(3, 1)] * 3 + [(4, 0)] * 2 + [(5, 1)] * 2
    )
    df = spark.createDataFrame(rows, "d long, e int")
    got = {
        r.duration: (r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in kaplan_meier(df, "d", "e").collect()
    }
    s1 = 1 - 2 / 10
    s3 = s1 * (1 - 3 / 7)
    assert got[1] == (10, 2, 0, round(s1, 6))
    assert got[2] == (8, 0, 1, round(s1, 6))      # censoring leaves S flat
    assert got[3] == (7, 3, 0, round(s3, 6))
    assert got[4] == (4, 0, 2, round(s3, 6))
    assert got[5] == (2, 2, 0, 0.0)               # whole risk set dies


def test_logrank_identical_groups_chi2_near_zero_different_groups_large(spark):
    from pipes_spark.operators.timeseries import logrank_test

    # identical survival in both groups -> chi2 == 0 exactly (E1 == d1)
    rows = [(t, 1, g) for g in (0, 1) for t in [1, 2, 3, 4, 5]]
    df = spark.createDataFrame(rows, "d long, e int, g int")
    r = logrank_test(df, "d", "e", F.col("g")).collect()[0]
    assert (r.n1, r.n0, r.observed1) == (5, 5, 5)
    assert r.chi2 == 0.0
    # group 1 dies much earlier -> large chi2
    rows2 = [(t, 1, 1) for t in [1, 1, 2, 2, 3]] + [
        (t, 1, 0) for t in [10, 11, 12, 13, 14]
    ]
    df2 = spark.createDataFrame(rows2, "d long, e int, g int")
    r2 = logrank_test(df2, "d", "e", F.col("g")).collect()[0]
    assert r2.chi2 > 3.84  # significant at 5% for 1 dof
    assert r2.observed1 > r2.expected1  # group 1 over-dies early


def test_spearman_monotone_nonlinear_is_one_pearson_is_not(spark):
    from pipes_spark.operators.profiling import spearman_corr

    # perfect monotone but strongly nonlinear: rho = 1 exactly
    rows = [(float(i), float(i) ** 5) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, F.col("x"), F.col("y")).collect()[0]
    assert (r.n, r.rho) == (29, 1.0)
    # reversed -> -1
    rows2 = [(float(i), -(float(i) ** 3)) for i in range(1, 30)]
    df2 = spark.createDataFrame(rows2, "x double, y double")
    assert spearman_corr(df2, F.col("x"), F.col("y")).collect()[0].rho == -1.0


def test_spearman_ties_match_scipy_free_reference(spark):
    from pipes_spark.operators.profiling import spearman_corr

    xs = [1.0, 2.0, 2.0, 3.0]
    ys = [10.0, 20.0, 30.0, 30.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    # average ranks: x -> [1, 2.5, 2.5, 4]; y -> [1, 2, 3.5, 3.5]
    import statistics

    rx, ry = [1, 2.5, 2.5, 4], [1, 2, 3.5, 3.5]
    mx, my = statistics.mean(rx), statistics.mean(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    r = spearman_corr(df, F.col("x"), F.col("y")).collect()[0]
    assert r.rho == round(num / den, 6)


def test_cohort_ltv_is_cumulative_and_per_user_scaled(spark, sf_dir):
    from pipes_spark.catalog import QUERIES

    rows = QUERIES["events_cohort_ltv"].fn(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for cohort, rs in by_cohort.items():
        ages = [r.age_weeks for r in rs]
        assert ages == sorted(ages)
        cums = [r.cum_revenue for r in rs]
        assert cums == sorted(cums)  # cumulative never decreases
        for r in rs:
            assert r.ltv_per_user == round(r.cum_revenue / r.n_users, 6) or abs(
                r.ltv_per_user - r.cum_revenue / r.n_users
            ) < 1e-4  # ltv derives from the unrounded cumulative


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    import datetime

    from pipes_spark.operators.timeseries import seasonal_decompose

    # flat level 100 + weekly bumps: +10 on pos 0, -10 on pos 3
    base = datetime.datetime(2024, 1, 1)  # a Monday -> pos 0
    rows = []
    for i in range(28):
        bump = 10.0 if i % 7 == 0 else (-10.0 if i % 7 == 3 else 0.0)
        rows.append(("k", base + datetime.timedelta(days=i), 100.0 + bump))
    df = spark.createDataFrame(rows, "k string, day timestamp, y double")
    out = {r.day.day: r for r in seasonal_decompose(df, ["k"], "day", "y").collect() if r.day.month == 1}
    mid = out[10]  # interior day, full window
    assert mid.trend == 100.0  # the bumps cancel inside every 7-day window
    assert out[8].seasonal == 10.0 and out[11].seasonal == -10.0
    assert out[10].remainder == 0.0
    # edges (first/last 3 days) have NULL trend, honestly
    assert out[1].trend is None and out[28].trend is None


def test_perplexity_flags_shuffled_text_above_natural(spark):
    from pipes_spark.operators.text import bigram_perplexity

    # doc 1/2: repeated natural bigrams; doc 3: the same words in an
    # order the corpus model never sees elsewhere
    rows = [
        (1, "the cat sat on the mat " * 5),
        (2, "the cat sat on the mat " * 5),
        (3, "mat the on sat cat the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.perplexity for r in bigram_perplexity(df).collect()}
    assert got[1] == got[2]  # identical docs score identically
    assert got[3] > got[1] * 2  # shuffled word order is far more surprising


def test_perplexity_short_docs_are_null_or_absent(spark):
    from pipes_spark.operators.text import bigram_perplexity

    df = spark.createDataFrame(
        [(1, "single"), (2, "two words here")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_bigrams for r in bigram_perplexity(df).collect()}
    assert 1 not in got  # no bigrams -> no row (the <2-token contract)
    assert got[2] == 2


def test_drop_near_duplicates_best_keeps_highest_quality_member(spark):
    from pipes_spark.operators.components import (
        drop_near_duplicates,
        drop_near_duplicates_best,
    )

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (4, 1.0), (9, 2.0)],
        "doc_id long, quality double",
    )
    # cluster {1,2,3} plus a pair {4,9}; 2 and 9 are the best members
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 9)], "id_a long, id_b long"
    )
    best = sorted(
        r.doc_id
        for r in drop_near_duplicates_best(docs, pairs, F.col("quality")).collect()
    )
    assert best == [2, 9]
    # contrast: the min-id policy keeps 1 and 4
    minid = sorted(r.doc_id for r in drop_near_duplicates(docs, pairs).collect())
    assert minid == [1, 4]


def test_rmst_hand_computed_and_capped(spark):
    from pipes_spark.operators.timeseries import kaplan_meier, rmst

    # half die at t=2, rest survive past the horizon (censored at 10)
    rows = [(2, 1)] * 5 + [(10, 0)] * 5
    df = spark.createDataFrame(rows, "d long, e int")
    km = kaplan_meier(df, "d", "e")
    # S=1 on [0,2), S=0.5 on [2,10): RMST(6) = 1*2 + 0.5*4 = 4
    r = rmst(km, tau=6.0).collect()[0]
    assert (r.tau, r.rmst) == (6.0, 4.0)
    # tau beyond last duration: 1*2 + 0.5*8 + 0.5*(12-10) = 7
    r2 = rmst(km, tau=12.0).collect()[0]
    assert r2.rmst == 7.0


def test_peak_concurrency_golden_overlaps(spark, sf_dir):
    from pipes_spark.catalog import QUERIES

    # validate the sweep-line shape on the real table: peak can never
    # exceed the number of distinct users active that day, and is >= 1
    rows = QUERIES["events_peak_concurrency"].fn(spark, sf_dir).collect()
    assert rows and all(r.peak_concurrent >= 1 for r in rows)
    from pipes_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    per_day_users = {
        r.day: r.n
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.peak_concurrent <= per_day_users.get(r.day, 10**9)


# ---------------------------------------------------------------------------
# anova_oneway
# ---------------------------------------------------------------------------


def test_anova_oneway_matches_closed_form(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.profiling import anova_oneway

    rng = np.random.RandomState(11)
    groups = {"a": rng.randn(30) + 0.0, "b": rng.randn(25) + 1.5, "c": rng.randn(40) + 0.5}
    rows = [(g, round(float(v), 6)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    xs = np.concatenate(list(groups.values())).round(6)
    mu = xs.mean()
    ssb = sum(len(v) * (v.round(6).mean() - mu) ** 2 for v in groups.values())
    ssw = sum(((v.round(6) - v.round(6).mean()) ** 2).sum() for v in groups.values())
    f = (ssb / 2) / (ssw / (len(xs) - 3))
    assert r["n_groups"] == 3 and r["n_total"] == 95
    assert r["df_between"] == 2 and r["df_within"] == 92
    assert r["ss_between"] == pytest.approx(ssb, rel=1e-4)
    assert r["ss_within"] == pytest.approx(ssw, rel=1e-4)
    assert r["f_stat"] == pytest.approx(f, rel=1e-4)
    # one group / empty input degeneracies: NULL F, no throw
    one = anova_oneway(df.filter(F.col("g") == "a"), "g", "v").collect()[0]
    assert one["f_stat"] is None and one["df_between"] == 0


def test_naive_bayes_confusion_golden(spark):
    from pipes_spark.operators.linear_model import naive_bayes_confusion

    rows = [
        # class "en": token "the" dominates; class "de": token "der"
        (1, "en", "the cat the dog"),
        (2, "en", "the bird"),
        (3, "de", "der hund der"),
        (4, "de", "der vogel"),
        # a "de"-labeled doc written with English tokens → predicted en
        (5, "de", "the the the cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {(r["lang"], r["predicted"]): r["n_docs"]
           for r in naive_bayes_confusion(df, "lang", "text", "doc_id").collect()}
    assert got[("en", "en")] == 2
    assert got[("de", "de")] == 2
    assert got[("de", "en")] == 1
    assert sum(got.values()) == 5


def test_link_prediction_bipartite_golden(spark):
    import math

    import pytest

    from pipes_spark.operators.components import link_prediction_bipartite

    # items: p1 shared by u1,u2,u3 (deg 3); p2 shared by u1,u2 (deg 2);
    # p3 only u3 (deg 1 → dropped); p4 shared by all four (deg 4)
    edges = [
        (1, "p1"), (2, "p1"), (3, "p1"),
        (1, "p2"), (2, "p2"),
        (3, "p3"),
        (1, "p4"), (2, "p4"), (3, "p4"), (4, "p4"),
    ]
    df = spark.createDataFrame(edges, "u long, item string")
    got = {(r["left_a"], r["left_b"]): r
           for r in link_prediction_bipartite(df, "u", "item", min_common=1).collect()}
    r12 = got[(1, 2)]
    assert r12["n_common"] == 3
    expect_aa = round(1 / math.log(3), 6) + round(1 / math.log(2), 6) + round(1 / math.log(4), 6)
    assert r12["adamic_adar"] == pytest.approx(expect_aa, abs=2e-6)
    # deg(u1)=3, deg(u2)=3 (p3 dropped does not affect LEFT degrees... u3 has p3)
    assert r12["jaccard"] == pytest.approx(3 / (3 + 3 - 3), 6)
    # u4 shares only the popular p4
    assert got[(1, 4)]["n_common"] == 1
    assert got[(1, 4)]["adamic_adar"] == pytest.approx(round(1 / math.log(4), 6), abs=2e-6)
    # jaccard uses FULL left degrees: u3 has {p1,p3,p4} → |∪|=3+3-2
    assert got[(1, 3)]["jaccard"] == pytest.approx(round(2 / 4, 6))
    # posting cap drops p4 from scoring
    capped = {(r["left_a"], r["left_b"]): r["n_common"]
              for r in link_prediction_bipartite(df, "u", "item",
                                                 min_common=1, max_postings=3).collect()}
    assert (1, 4) not in capped and capped[(1, 2)] == 2


def test_fit_ridge_matches_numpy(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.linear_model import fit_ridge

    rng = np.random.RandomState(3)
    n, d = 400, 3
    X = np.round(rng.randn(n, d) * 2, 6)
    beta_true = np.array([1.5, -2.0, 0.75])
    y = np.round(X @ beta_true + 4.0 + rng.randn(n) * 0.1, 6)
    rows = [tuple(map(float, X[i])) + (float(y[i]),) for i in range(n)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, y double")

    for l2 in (0.0, 5.0):
        got = {r["feature"]: r["coef"]
               for r in fit_ridge(df, ["x1", "x2", "x3"], "y", l2=l2).collect()}
        Xa = np.hstack([np.ones((n, 1)), X])
        A = Xa.T @ Xa + l2 * np.diag([0.0, 1, 1, 1])
        expect = np.linalg.solve(A, Xa.T @ y)
        assert got["intercept"] == pytest.approx(expect[0], abs=1e-5)
        for i, c in enumerate(["x1", "x2", "x3"]):
            assert got[c] == pytest.approx(expect[i + 1], abs=1e-5), (l2, c)
    # l2=0 equals ordinary least squares
    got0 = {r["feature"]: r["coef"]
            for r in fit_ridge(df, ["x1", "x2", "x3"], "y", l2=0.0).collect()}
    lst, *_ = np.linalg.lstsq(np.hstack([np.ones((n, 1)), X]), y, rcond=None)
    assert got0["x1"] == pytest.approx(lst[1], abs=1e-5)


def test_cohens_kappa_golden(spark):
    import pytest

    from pipes_spark.operators.profiling import cohens_kappa

    # textbook 2x2: raters agree on 20 of 30; both marginals are 20/10
    rows = (
        [("x", "x")] * 15 + [("x", "y")] * 5 + [("y", "y")] * 5 + [("y", "x")] * 0
        + [("y", "y")] * 0 + [("y", "x")] * 5
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    # po = 20/30; pe = (20*20 + 10*10)/900
    po, pe = 20 / 30, (20 * 20 + 10 * 10) / 900
    assert r["n_items"] == 30
    assert r["observed_agreement"] == pytest.approx(po, abs=1e-6)
    assert r["expected_agreement"] == pytest.approx(pe, abs=1e-6)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)
    # constant raters → pe = 1 → NULL kappa, no division error
    const = spark.createDataFrame([("k", "k")] * 5, "a string, b string")
    assert cohens_kappa(const, "a", "b").collect()[0]["kappa"] is None


def test_sequence_ngrams_golden(spark):
    from datetime import datetime, timedelta

    import pytest

    from pipes_spark.operators.relational import sequence_ngrams

    t0 = datetime(2024, 1, 1)
    # u1: a b c a b d ; u2: a b c  → trigrams: (a,b,c)x2, (b,c,a), (c,a,b), (a,b,d)
    seqs = {1: ["a", "b", "c", "a", "b", "d"], 2: ["a", "b", "c"]}
    rows = [(u, t0 + timedelta(minutes=i), s, u * 100 + i)
            for u, types in seqs.items() for i, s in enumerate(types)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    got = {(r["step1"], r["step2"], r["step3"]): r
           for r in sequence_ngrams(df, "user_id", "ts", "event_type", n=3,
                                    order_tiebreak="event_id").collect()}
    assert got[("a", "b", "c")]["n"] == 2
    assert got[("a", "b", "d")]["n"] == 1
    # P(c | a,b) = 2/3, P(d | a,b) = 1/3
    assert got[("a", "b", "c")]["prob"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[("a", "b", "d")]["prob"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[("b", "c", "a")]["n"] == 1 and got[("b", "c", "a")]["prob"] == 1.0
    # bigram mode degenerates to path_transitions counts
    got2 = {(r["step1"], r["step2"]): r["n"]
            for r in sequence_ngrams(df, "user_id", "ts", "event_type", n=2,
                                     order_tiebreak="event_id").collect()}
    assert got2[("a", "b")] == 3 and got2[("b", "c")] == 2


def test_perceptual_hash_pairs_semantics(spark):
    from pipes_spark.operators.multimodal import (
        binary_assets_from_text,
        perceptual_hash,
        phash_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 20
    docs = [
        (1, base),
        (2, base),                      # exact duplicate → hamming 0
        (3, base[:-9] + "CAT RULES"),   # small tail edit → small hamming
        (4, "".join(chr(65 + (i * 7) % 26) for i in range(800))),  # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    hashes = {r["asset_id"]: r["phash"]
              for r in perceptual_hash(binary_assets_from_text(df)).collect()}
    assert hashes[1] == hashes[2]
    # determinism across partitionings
    hashes_re = {r["asset_id"]: r["phash"]
                 for r in perceptual_hash(
                     binary_assets_from_text(df.repartition(3))).collect()}
    assert hashes == hashes_re
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in phash_pairs(
                 perceptual_hash(binary_assets_from_text(df)), max_hamming=7
             ).collect()}
    assert pairs[(1, 2)] == 0
    assert all(h <= 7 for h in pairs.values())
    # the unrelated doc pairs with nothing
    assert not any(4 in p for p in pairs)


def test_tukey_hsd_matches_closed_form(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.profiling import tukey_hsd

    rng = np.random.RandomState(5)
    groups = {"a": rng.randn(20).round(6), "b": (rng.randn(30) + 2).round(6),
              "c": (rng.randn(25) + 2).round(6)}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["group_a"], r["group_b"]): r for r in tukey_hsd(df, "g", "v").collect()}
    N = sum(len(v) for v in groups.values())
    k = 3
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    msw = ssw / (N - k)
    for (ga, gb), r in got.items():
        va, vb = groups[ga], groups[gb]
        diff = va.mean() - vb.mean()
        se = np.sqrt(msw / 2 * (1 / len(va) + 1 / len(vb)))
        assert r["mean_diff"] == pytest.approx(diff, abs=1e-4)
        assert r["q_stat"] == pytest.approx(abs(diff) / se, rel=1e-3)
    # separated pair (a vs b) scores far above the equal-mean pair (b vs c)
    assert got[("a", "b")]["q_stat"] > 5 * got[("b", "c")]["q_stat"]
    # constant single-group input → zero MSW → NULL q, no throw
    const = spark.createDataFrame([("x", 1.0), ("x", 1.0), ("y", 1.0)],
                                  "g string, v double")
    rr = tukey_hsd(const, "g", "v").collect()
    assert all(r["q_stat"] is None for r in rr)


def test_balanced_sample_semantics(spark):
    from pipes_spark.operators.sampling import balanced_sample

    rows = ([("big", i) for i in range(2000)] + [("small", 10000 + i) for i in range(100)])
    df = spark.createDataFrame(rows, "cls string, k long")
    out = balanced_sample(df, "cls", "k")
    sizes = {r["cls"]: r["n"] for r in
             out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    # smallest class kept (almost) whole; big class downsampled to ≈ 100
    assert sizes["small"] >= 95
    assert 60 <= sizes["big"] <= 150
    # determinism across partitionings
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in balanced_sample(df.repartition(7), "cls", "k").collect()}
    assert a == b
    # independent salt gives a different (same-sized-ish) subset
    c = {tuple(r) for r in balanced_sample(df, "cls", "k", salt="v2").collect()}
    assert c != a


def test_activity_streaks_golden(spark):
    from datetime import datetime

    from pipes_spark.operators.relational import activity_streaks

    def d(day):
        return datetime(2024, 1, day, 12, 0)

    rows = (
        # u1: days 1,2,3 then 5,6 → streaks [3, 2]; duplicate events same day
        [(1, d(1)), (1, d(1)), (1, d(2)), (1, d(3)), (1, d(5)), (1, d(6))]
        # u2: single day
        + [(2, d(10))]
        # u3: all 5 days consecutive
        + [(3, d(i)) for i in range(20, 25)]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["user_id"]: r for r in activity_streaks(df, "user_id", "ts").collect()}
    assert got[1]["n_active_days"] == 5
    assert got[1]["n_streaks"] == 2 and got[1]["longest_streak"] == 3
    assert got[2]["n_streaks"] == 1 and got[2]["longest_streak"] == 1
    assert got[3]["n_streaks"] == 1 and got[3]["longest_streak"] == 5


def test_sketch_overlap_close_to_exact(spark):
    import pytest

    from pipes_spark.operators.rollup import sketch_overlap

    # set A = users 0..999; set B = 500..1499 (overlap 500); C = 2000..2099
    rows = ([("A", i) for i in range(1000)]
            + [("B", i) for i in range(500, 1500)]
            + [("C", i) for i in range(2000, 2100)])
    df = spark.createDataFrame(rows, "s string, u long")
    got = {(r["set_a"], r["set_b"]): r for r in sketch_overlap(df, "s", "u").collect()}
    ab = got[("A", "B")]
    assert ab["est_a"] == pytest.approx(1000, rel=0.05)
    assert ab["est_union"] == pytest.approx(1500, rel=0.05)
    assert ab["est_intersection"] == pytest.approx(500, rel=0.15)
    assert ab["overlap_frac"] == pytest.approx(0.5, abs=0.1)
    # disjoint pair estimates ≈ 0 intersection (clamped ≥ 0)
    ac = got[("A", "C")]
    assert ac["est_intersection"] <= 0.1 * 1000
    assert ac["overlap_frac"] is not None and ac["overlap_frac"] < 0.12


def test_arrow_batch_normalize_matches_numpy(spark, sf_dir):
    import numpy as np
    import pytest

    from pipes_spark.operators.udfs import arrow_batch_normalize
    from pipes_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    raw = {r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
           for r in emb.collect()}
    got = {r["vec_id"]: r for r in arrow_batch_normalize(emb).collect()}
    assert set(got) == set(raw)
    for vid, v in raw.items():
        n = float(np.linalg.norm(v))
        assert got[vid]["l2_norm"] == pytest.approx(n, rel=1e-6)
        u = np.asarray(got[vid]["unit"])
        assert float(np.linalg.norm(u)) == pytest.approx(1.0 if n > 0 else 0.0, abs=1e-9)


def test_grouped_agg_harmonic_mean_semantics(spark):
    import pytest

    from pipes_spark.operators.udfs import grouped_agg_harmonic_mean

    rows = [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 3.0),
            ("b", None), ("b", 0.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r["harmonic_mean"]
           for r in grouped_agg_harmonic_mean(df, "g", "v").collect()}
    assert got["a"] == pytest.approx(3 / (1 + 0.5 + 0.25), abs=1e-6)
    # null/zero excluded; the 6-decimal reciprocal convention makes the
    # lone value 1/round(1/3, 6) = 3.000003, matching the SQL oracle
    assert got["b"] == pytest.approx(1 / round(1 / 3, 6), abs=1e-6)


def test_fit_pca_matches_numpy(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.linear_model import fit_pca

    rng = np.random.RandomState(13)
    # anisotropic gaussian: variances 25, 9, 1, 1e-2 along rotated axes
    base = rng.randn(300, 4) * np.array([5.0, 3.0, 1.0, 0.1])
    Q, _ = np.linalg.qr(rng.randn(4, 4))
    X = (base @ Q).round(6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    got = {r["component"]: r for r in fit_pca(df, "embedding", k=4).collect()}
    # float32 storage quantizes the inputs — compare against numpy on the
    # same float32-rounded matrix
    X32 = X.astype("float32").astype("float64")
    C = np.cov(X32, rowvar=False, bias=True)
    evals = np.linalg.eigh(C)[0][::-1]
    ratios = evals / evals.sum()
    for i in range(1, 5):
        assert got[i]["eigenvalue"] == pytest.approx(evals[i - 1], rel=1e-3)
        assert got[i]["explained_variance_ratio"] == pytest.approx(ratios[i - 1], abs=1e-4)
    # partition invariance of the reported (rounded) spectrum
    got2 = {r["component"]: r["eigenvalue"]
            for r in fit_pca(df.repartition(7), "embedding", k=4).collect()}
    for i in range(1, 5):
        assert got2[i] == pytest.approx(got[i]["eigenvalue"], abs=1e-4)


def test_kruskal_wallis_matches_closed_form(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.profiling import kruskal_wallis

    rng = np.random.RandomState(23)
    groups = {"a": rng.randn(25).round(3), "b": (rng.randn(30) + 1.2).round(3),
              "c": (rng.randn(20) + 0.4).round(3)}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    # closed form with scipy-free average ranks
    allv = np.concatenate(list(groups.values()))
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    pos = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    N = len(allv)
    off = 0
    ssum = 0.0
    for g, vs in groups.items():
        rg = ranks[off:off + len(vs)].sum()
        ssum += rg * rg / len(vs)
        off += len(vs)
    uniq, counts = np.unique(allv, return_counts=True)
    corr = 1 - ((counts ** 3 - counts).sum()) / (N ** 3 - N)
    h = (12 / (N * (N + 1)) * ssum - 3 * (N + 1)) / corr
    assert r["n_total"] == N and r["n_groups"] == 3 and r["df"] == 2
    assert r["h_stat"] == pytest.approx(h, rel=1e-4)
    # identical single-value input → correction divisor 0 → NULL
    const = spark.createDataFrame([("a", 1.0), ("b", 1.0)], "g string, v double")
    assert kruskal_wallis(const, "g", "v").collect()[0]["h_stat"] is None


def test_conformal_interval_validity(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.linear_model import conformal_interval_report

    rng = np.random.RandomState(31)
    n = 2000
    x = np.round(rng.uniform(0, 10, n), 3)
    y = np.round(3.0 * x + 5.0 + rng.randn(n), 3)
    df = spark.createDataFrame(
        [(i, float(x[i]), float(y[i])) for i in range(n)],
        "k long, x double, y double",
    )
    r = conformal_interval_report(df, "k", "x", "y", alpha=0.1).collect()[0]
    # recovers the linear model and a sane band for unit-normal noise
    assert r["slope"] == pytest.approx(3.0, abs=0.1)
    assert r["intercept"] == pytest.approx(5.0, abs=0.5)
    assert 1.2 < r["qhat"] < 2.2  # ≈ z_0.95 ≈ 1.64 for N(0,1) residuals
    # the conformal guarantee: coverage ≥ 1 − α (up to sampling noise)
    assert r["coverage"] >= 0.88
    assert r["n_fit"] + r["n_cal"] == n
    # determinism across partitionings
    r2 = conformal_interval_report(
        df.repartition(7), "k", "x", "y", alpha=0.1
    ).collect()[0]
    assert (r2["qhat"], r2["coverage"]) == (r["qhat"], r["coverage"])


def test_cuped_reduces_variance_preserves_lift(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.profiling import cuped_ab_test

    rng = np.random.RandomState(41)
    n = 2000
    # strong user-level baseline carried from pre to post + true lift 0.5 in B
    base = rng.randn(n) * 5
    pre = np.round(base + rng.randn(n), 6)
    variant = np.where(np.arange(n) % 2 == 0, "A", "B")
    lift = np.where(variant == "B", 0.5, 0.0)
    post = np.round(base + lift + rng.randn(n), 6)
    df = spark.createDataFrame(
        [(str(variant[i]), float(pre[i]), float(post[i])) for i in range(n)],
        "variant string, pre double, post double",
    )
    r = cuped_ab_test(df, "variant", "pre", "post").collect()[0]
    assert (r["variant_a"], r["variant_b"]) == ("A", "B")
    # theta ≈ cov/var ≈ 25/26; big variance reduction; lift preserved
    assert r["theta"] == pytest.approx(25 / 26, abs=0.08)
    assert r["var_reduction"] > 0.85
    assert r["diff"] == pytest.approx(-0.5, abs=0.15)
    # CUPED must make the lift far more significant than raw Welch
    from pipes_spark.operators.profiling import ab_test

    raw = ab_test(df, "variant", "post").collect()[0]
    assert abs(r["t_welch"]) > 2 * abs(raw["t_stat"])


def test_append_ivf_vectors_lifecycle(spark, sf_dir, tmp_path):
    """add-after-train: new vectors join the persisted index without a
    refit, idempotently, and probes over the refreshed table find them."""
    import os
    import shutil

    import numpy as np

    from pipes_spark.warehouse import append_ivf_vectors, ivf_index_tables

    # isolated index namespace: table names derive from the dir basename
    fake_sf = str(tmp_path / "ivfappend")
    os.makedirs(fake_sf)
    shutil.copy(os.path.join(sf_dir, "embeddings.parquet"),
                os.path.join(fake_sf, "embeddings.parquet"))
    try:
        cb, corpus = ivf_index_tables(spark, fake_sf, num_centroids=8)
        n0 = corpus.count()
        # three new vectors = tiny perturbations of existing centroids
        C = [r["centroid"] for r in cb.orderBy("list_id").collect()]
        new_rows = [(100000 + i, [float(x) + 0.001 for x in C[i]], 0)
                    for i in range(3)]
        new_df = spark.createDataFrame(
            new_rows, "vec_id long, embedding array<float>, label int")
        refreshed = append_ivf_vectors(spark, fake_sf, new_df, num_centroids=8)
        assert refreshed.count() == n0 + 3
        # idempotent: same batch again adds zero rows
        refreshed = append_ivf_vectors(spark, fake_sf, new_df, num_centroids=8)
        assert refreshed.count() == n0 + 3
        # each appended vector landed in the list whose centroid it hugs,
        # so a probe that prunes to that list finds it
        got = {r["vec_id"]: r["list_id"] for r in
               refreshed.filter(F.col("vec_id") >= 100000).collect()}
        assert got == {100000 + i: i for i in range(3)}
    finally:
        tag = "ivfappend"
        for t in (f"ivf_codebook_{tag}_8", f"ivf_corpus_{tag}_8"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cuped_rejects_wrong_variant_count(spark):
    import pytest

    from pipes_spark.operators.profiling import cuped_ab_test

    three = spark.createDataFrame(
        [("A", 1.0, 1.0), ("B", 2.0, 2.0), ("C", 3.0, 3.0)] * 4,
        "variant string, pre double, post double",
    )
    with pytest.raises(Exception, match="exactly 2 variants"):
        cuped_ab_test(three, "variant", "pre", "post").collect()


def test_ab_power_analysis_closed_form(spark):
    import math

    import numpy as np
    import pytest

    from pipes_spark.operators.profiling import ab_power_analysis

    rng = np.random.RandomState(47)
    v = np.round(rng.randn(5000) * 2 + 10, 6)
    df = spark.createDataFrame([(float(x),) for x in v], "value double")
    got = {r["mde_frac"]: r for r in ab_power_analysis(df, "value").collect()}
    var = v.var(ddof=1)
    for mde in (0.01, 0.05):
        delta = v.mean() * mde
        expect = math.ceil(2 * (1.959964 + 0.841621) ** 2 * var / delta**2)
        assert got[mde]["n_per_arm"] == pytest.approx(expect, rel=1e-3)
    # smaller effects need quadratically more samples
    assert got[0.01]["n_per_arm"] > 20 * got[0.05]["n_per_arm"]


def test_markov_stationary_matches_eigenvector(spark):
    from datetime import datetime, timedelta

    import numpy as np
    import pytest

    from pipes_spark.operators.relational import markov_stationary

    # a chain with a known bias: a→b always, b→a 30% / b→b 70%
    rng = np.random.RandomState(53)
    t0 = datetime(2024, 1, 1)
    rows = []
    state = "a"
    for i in range(600):
        rows.append((1, t0 + timedelta(minutes=i), state, i))
        state = "b" if state == "a" else ("a" if rng.rand() < 0.3 else "b")
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    got = {r["state"]: r["stationary_prob"]
           for r in markov_stationary(df, "user_id", "ts", "event_type",
                                      order_tiebreak="event_id").collect()}
    # independent check: left eigenvector of the EMPIRICAL matrix
    trans = np.zeros((2, 2))
    seq = [r[2] for r in rows]
    for x, y in zip(seq, seq[1:]):
        trans[0 if x == "a" else 1][0 if y == "a" else 1] += 1
    P = trans / trans.sum(axis=1, keepdims=True)
    w, v = np.linalg.eig(P.T)
    pi = np.real(v[:, np.argmax(np.real(w))])
    pi = pi / pi.sum()
    assert got["a"] == pytest.approx(pi[0], abs=2e-3)
    assert got["b"] == pytest.approx(pi[1], abs=2e-3)
    assert got["a"] + got["b"] == pytest.approx(1.0, abs=2e-6)
    # PERIODIC chain (hub-and-spoke: h→a→h→b→…): the raw power iteration
    # oscillates forever; the lazy walk must converge to the true
    # stationary distribution (0.5, 0.25, 0.25)
    seq2, cur = [], "h"
    rng2 = np.random.RandomState(7)
    for i in range(400):
        seq2.append(cur)
        cur = ("a" if rng2.rand() < 0.5 else "b") if cur == "h" else "h"
    rows2 = [(1, t0 + timedelta(minutes=i), s2, i) for i, s2 in enumerate(seq2)]
    df2 = spark.createDataFrame(
        rows2, "user_id long, ts timestamp, event_type string, event_id long")
    got2 = {r["state"]: r["stationary_prob"]
            for r in markov_stationary(df2, "user_id", "ts", "event_type",
                                       order_tiebreak="event_id").collect()}
    assert got2["h"] == pytest.approx(0.5, abs=0.02)
    assert got2["a"] + got2["b"] == pytest.approx(0.5, abs=0.02)


def test_geo_nearest_join_matches_brute_force(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.geo import geo_nearest_join, haversine_km

    rng = np.random.RandomState(59)
    # points in a ~20km box around (40, -74); POIs sparser in the same box
    plat = 40 + rng.uniform(0, 0.18, 200)
    plon = -74 + rng.uniform(0, 0.18, 200)
    qlat = 40 + rng.uniform(0, 0.18, 15)
    qlon = -74 + rng.uniform(0, 0.18, 15)
    pts = spark.createDataFrame(
        [(i, float(plat[i]), float(plon[i])) for i in range(200)],
        "point_id long, lat double, lon double",
    )
    pois = spark.createDataFrame(
        [(j, float(qlat[j]), float(qlon[j])) for j in range(15)],
        "poi_id long, lat double, lon double",
    )
    got = {r["point_id"]: (r["poi_id"], r["distance_km"])
           for r in geo_nearest_join(pts, pois, radius_km=3.0).collect()}

    def hav(a1, o1, a2, o2):
        import math
        r = math.pi / 180
        x = (math.sin((a2 - a1) * r / 2) ** 2
             + math.cos(a1 * r) * math.cos(a2 * r) * math.sin((o2 - o1) * r / 2) ** 2)
        return 2 * 6371 * math.asin(math.sqrt(min(x, 1.0)))

    for i in range(200):
        d = [(hav(plat[i], plon[i], qlat[j], qlon[j]), j) for j in range(15)]
        dmin, jmin = min(d)
        if dmin <= 3.0:
            assert i in got, i
            assert got[i][0] == jmin
            assert got[i][1] == pytest.approx(dmin, abs=1e-5)
        else:
            assert i not in got, i
    # (the no-cartesian pruning property is asserted on the physical plan
    # in tests/test_plans.py::test_geo_nearest_join_no_cartesian)


def test_geo_hotspots_semantics(spark):
    import pytest

    from pipes_spark.operators.geo import geo_hotspots

    # dense blob at one cell + singleton far away (cell ≈ 0.009° at 1 km)
    rows = [(40.0005, -74.0005)] * 50 + [(40.0995, -74.0995)]
    df = spark.createDataFrame(rows, "lat double, lon double")
    got = {(r["cy"], r["cx"]): r for r in geo_hotspots(df, cell_km=1.0,
                                                       max_abs_lat=0.0).collect()}
    assert len(got) == 2
    hot = max(got.values(), key=lambda r: r["n"])
    lone = min(got.values(), key=lambda r: r["n"])
    assert hot["n"] == 50 and lone["n"] == 1
    # isolated cells hold 100% of their neighbourhood mass
    assert hot["density_ratio"] == pytest.approx(1.0)
    assert lone["density_ratio"] == pytest.approx(1.0)
    # two adjacent singletons split their shared neighbourhood
    adj = spark.createDataFrame(
        [(40.0005, -74.0005), (40.0005, -74.0005 + 0.009)], "lat double, lon double")
    g2 = {(r["cy"], r["cx"]): r["density_ratio"]
          for r in geo_hotspots(adj, cell_km=1.0, max_abs_lat=0.0).collect()}
    assert all(v == pytest.approx(0.5) for v in g2.values())


def test_dynamic_unpivot_udtf_polymorphic_schema(spark):
    from pipes_spark.operators.udfs import dynamic_unpivot_udtf

    # homogeneous doubles → value column is DOUBLE
    num = spark.createDataFrame([(1, 1.5, 2.5)], "doc_id long, a double, b double")
    out = dynamic_unpivot_udtf(num, ["a", "b"])
    assert dict(out.dtypes)["value"] == "double"
    rows = {(r["column"], r["value"]) for r in out.collect()}
    assert rows == {("a", 1.5), ("b", 2.5)}
    # mixed types → the analyze fallback types value as STRING
    mixed = spark.createDataFrame([(1, 7, "x")], "doc_id long, a long, b string")
    out2 = dynamic_unpivot_udtf(mixed, ["a", "b"])
    assert dict(out2.dtypes)["value"] == "string"
    assert {(r["column"], r["value"]) for r in out2.collect()} == {("a", "7"), ("b", "x")}


def test_rolling_return_rate_golden(spark):
    from datetime import datetime

    import pytest

    from pipes_spark.operators.relational import rolling_return_rate

    def d(day, hour=9):
        return datetime(2024, 1, day, hour)

    rows = (
        # day 1: users 1,2,3 active; 1 returns day 3, 2 returns day 9 (>7d → no)
        [(1, d(1)), (2, d(1)), (3, d(1)), (1, d(3)), (2, d(9))]
        # day 3: users 1,4; 4 returns day 4
        + [(4, d(3)), (4, d(4))]
        # spread activity to day 20 so early days have full windows
        + [(9, d(20))]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"].day: r for r in
           rolling_return_rate(df, "user_id", "ts", window_days=7).collect()}
    r1 = got[1]
    assert r1["n_active"] == 3 and r1["n_returned"] == 1
    assert r1["return_rate"] == pytest.approx(1 / 3)
    r3 = got[3]
    assert r3["n_active"] == 2 and r3["n_returned"] == 1  # user 4 (day 4)
    assert r3["return_rate"] == pytest.approx(0.5)
    # day 20 is inside the truncated tail → NULL rate, counts still present
    assert got[20]["return_rate"] is None and got[20]["n_active"] == 1


def test_augment_token_dropout_semantics(spark):
    from pipes_spark.operators.text import augment_token_dropout

    base = "alpha beta gamma delta epsilon zeta eta theta " * 25
    df = spark.createDataFrame([(i, base) for i in range(4)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["text_aug"]
           for r in augment_token_dropout(df, rate=0.2, salt="s1").collect()}
    n0 = len(base.split())
    for i, aug in out.items():
        toks = aug.split()
        # ~20% dropped, never reordered, always a subsequence
        assert 0.6 * n0 < len(toks) < 0.95 * n0
        it = iter(base.split())
        assert all(any(t == u for u in it) for t in toks), "order broken"
    # different docs drop different positions (hash includes doc_id)
    assert len(set(out.values())) > 1
    # determinism across partitionings; independence across salts
    again = {r["doc_id"]: r["text_aug"]
             for r in augment_token_dropout(df.repartition(5), rate=0.2,
                                            salt="s1").collect()}
    assert again == out
    other = {r["doc_id"]: r["text_aug"]
             for r in augment_token_dropout(df, rate=0.2, salt="s2").collect()}
    assert other != out
    # rate 0 keeps everything
    keep = augment_token_dropout(df, rate=0.0).collect()[0]["text_aug"]
    assert keep.split() == base.split()


def test_woe_encoding_golden(spark):
    import math

    import pytest

    from pipes_spark.operators.features import woe_encoding

    # category A: 8 pos / 2 neg; B: 2 pos / 8 neg → symmetric ± WOE
    rows = [("A", 1)] * 8 + [("A", 0)] * 2 + [("B", 1)] * 2 + [("B", 0)] * 8
    df = spark.createDataFrame(rows, "c string, y int")
    got = {r["c"]: r for r in woe_encoding(df, "c", F.col("y") == 1).collect()}
    pp = (8 + 0.5) / 11.0
    pn = (2 + 0.5) / 11.0
    expect = math.log(pp / pn)
    assert got["A"]["woe"] == pytest.approx(expect, abs=1e-6)
    assert got["B"]["woe"] == pytest.approx(-expect, abs=1e-6)
    assert got["A"]["iv_term"] == pytest.approx((pp - pn) * expect, abs=1e-6)
    # IV terms are non-negative by construction
    assert all(r["iv_term"] >= 0 for r in got.values())
    # NULL labels are EXCLUDED, not counted as negatives
    withnull = spark.createDataFrame(
        rows + [("A", None)] * 5, "c string, y int")
    got2 = {r["c"]: r for r in
            woe_encoding(withnull, "c", F.when(F.col("y").isNotNull(),
                                               F.col("y") == 1)).collect()}
    assert got2["A"]["n_pos"] == 8 and got2["A"]["n_neg"] == 2
    assert got2["A"]["woe"] == got["A"]["woe"]


def test_mutual_information_semantics(spark):
    import math

    import pytest

    from pipes_spark.operators.profiling import mutual_information

    # perfectly dependent: b = f(a) bijectively → NMI = 1
    dep = spark.createDataFrame(
        [("x", 1)] * 10 + [("y", 2)] * 20 + [("z", 3)] * 30, "a string, b int")
    r = mutual_information(dep, "a", "b").collect()[0]
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    # independent (balanced product) → MI = 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in (1, 2) for _ in range(5)], "a string, b int")
    r2 = mutual_information(ind, "a", "b").collect()[0]
    assert r2["mutual_information"] == pytest.approx(0.0, abs=1e-6)
    assert r2["entropy_a"] == pytest.approx(math.log(2), abs=1e-6)
    # constant column → zero entropy → NULL NMI, no divide error
    const = spark.createDataFrame([("k", i % 3) for i in range(9)], "a string, b int")
    assert mutual_information(const, "a", "b").collect()[0]["nmi"] is None


def test_augment_span_corruption_semantics(spark):
    import re

    from pipes_spark.operators.text import augment_span_corruption

    base = " ".join(f"w{i}" for i in range(400))
    df = spark.createDataFrame([(1, base), (2, base)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           augment_span_corruption(df, rate=0.15, mean_span=3, salt="s1").collect()}
    for r in out.values():
        toks = r["text_corrupted"].split()
        sent = [t for t in toks if t.startswith("<extra_id_")]
        words = [t for t in toks if not t.startswith("<extra_id_")]
        # sentinels numbered 0..k-1 in order
        assert sent == [f"<extra_id_{i}>" for i in range(len(sent))]
        assert r["n_spans"] == len(sent)
        # masked fraction near the target rate
        assert 0.05 <= r["n_masked"] / 400 <= 0.3
        assert len(words) + r["n_masked"] == 400
        # surviving words keep original relative order
        idx = [int(w[1:]) for w in words]
        assert idx == sorted(idx)
        # consecutive surviving tokens never straddle a removed span
        # without a sentinel between them
        last_idx = None
        prev_was_sentinel = False
        for t in toks:
            if t.startswith("<extra_id_"):
                prev_was_sentinel = True
                continue
            idx2 = int(t[1:])
            if last_idx is not None and idx2 > last_idx + 1:
                assert prev_was_sentinel, (last_idx, idx2)
            last_idx = idx2
            prev_was_sentinel = False
    # determinism / salt independence
    again = {r["doc_id"]: r["text_corrupted"] for r in
             augment_span_corruption(df.repartition(4), rate=0.15, mean_span=3,
                                     salt="s1").collect()}
    assert again == {k: v["text_corrupted"] for k, v in out.items()}
    other = {r["doc_id"]: r["text_corrupted"] for r in
             augment_span_corruption(df, rate=0.15, mean_span=3, salt="s2").collect()}
    assert other != again
    # doc_id participates in the hash → different docs mask differently
    assert out[1]["text_corrupted"] != out[2]["text_corrupted"]


def test_modularity_known_structure(spark):
    import pytest

    from pipes_spark.operators.components import modularity

    # two K4 cliques joined by one bridge edge
    k4a = [(a, b) for a in range(4) for b in range(4) if a < b]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    edges = spark.createDataFrame(k4a + k4b + [(0, 10)], "src long, dst long")
    good = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(i + 10, 1) for i in range(4)],
        "vertex long, label long",
    )
    r = modularity(edges, good).collect()[0]
    assert r["n_communities"] == 2 and r["n_edges"] == 13
    assert r["n_edges_dropped"] == 0
    # closed form: e_c/m = 6/13 each; degree sums 13 each
    expect = 2 * (6 / 13 - (13 / 26) ** 2)
    assert r["modularity"] == pytest.approx(expect, abs=1e-6)
    # one-big-community scores ZERO exactly (e=m, d=2m)
    allone = spark.createDataFrame(
        [(i, 7) for i in list(range(4)) + [v + 10 for v in range(4)]],
        "vertex long, label long",
    )
    assert modularity(edges, allone).collect()[0]["modularity"] == pytest.approx(0.0, abs=1e-6)
    # the good partition beats a random-ish split
    bad = spark.createDataFrame(
        [(i, i % 2) for i in range(4)] + [(i + 10, i % 2) for i in range(4)],
        "vertex long, label long",
    )
    rb = modularity(edges, bad).collect()[0]
    assert r["modularity"] > rb["modularity"] + 0.2
    # partial assignment: uncovered edges are dropped VISIBLY
    half = good.filter(good.vertex < 10)
    rh = modularity(edges, half).collect()[0]
    assert rh["n_edges"] == 6 and rh["n_edges_dropped"] == 7


def test_set_minhash_similarity_estimates(spark):
    import pytest

    from pipes_spark.operators.dedup import set_minhash_signatures, similar_sets

    # sets with known Jaccard: A∩B = 95/105 ≈ 0.905 (high enough that a
    # full 4-row band match is near-certain); C disjoint
    rows = ([("A", f"i{i}") for i in range(100)]
            + [("B", f"i{i}") for i in range(5, 105)]
            + [("C", f"z{i}") for i in range(100)])
    df = spark.createDataFrame(rows, "s string, m string")
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in similar_sets(df, "s", "m", num_hashes=64, bands=16,
                                   threshold=0.2).collect()}
    assert ("A", "B") in pairs
    assert pairs[("A", "B")] == pytest.approx(95 / 105, abs=0.12)
    assert not any("C" in p for p in pairs)
    # signatures are set-semantic: duplicate members don't change them
    dup = df.unionByName(spark.createDataFrame(
        [("A", f"i{i}") for i in range(50)], "s string, m string"))
    a = set_minhash_signatures(df, "s", "m", 16).filter(F.col("s") == "A").collect()[0]
    b = set_minhash_signatures(dup, "s", "m", 16).filter(F.col("s") == "A").collect()[0]
    assert a.asDict() == b.asDict()


def test_variant_schema_discovery(spark):
    rows = [
        (1, '{"a": 1, "b": "x"}'),
        (1, '{"a": 2.5}'),            # a widens int → decimal/double
        (1, '{"c": [1, 2]}'),         # new field appears
        (2, '{"only": true}'),
    ]
    df = spark.createDataFrame(rows, "g int, props string")
    got = {r["g"]: r["props_schema"] for r in
           df.groupBy("g").agg(
               F.expr("schema_of_variant_agg(parse_json(props))").alias("props_schema")
           ).collect()}
    # merged schema of group 1 must mention all three fields with widened a
    assert "a:" in got[1].replace(" ", "") and "b:" in got[1].replace(" ", "")
    assert "c:" in got[1].replace(" ", "") and "ARRAY" in got[1]
    assert "STRING" in got[1]
    # group 2 sees only its own field
    assert "only" in got[2] and "a" not in got[2].replace("ARRAY", "")


def test_threshold_sweep_golden(spark):
    import pytest

    from pipes_spark.operators.linear_model import threshold_sweep

    # scores: positives at 0.9, 0.8, 0.4; negatives at 0.7, 0.3
    rows = [(1, 0.9), (1, 0.8), (0, 0.7), (1, 0.4), (0, 0.3)]
    df = spark.createDataFrame(rows, "y int, s double")
    got = {r["threshold"]: r for r in
           threshold_sweep(df, F.col("y") == 1, F.col("s")).collect()}
    r8 = got[0.8]  # predict positive at s >= 0.8: TP=2 FP=0 FN=1
    assert (r8["tp"], r8["fp"], r8["fn"]) == (2, 0, 1)
    assert r8["precision"] == 1.0 and r8["recall"] == pytest.approx(2 / 3)
    assert r8["f1"] == pytest.approx(2 * 2 / (2 * 2 + 0 + 1))
    r4 = got[0.4]  # TP=3 FP=1 FN=0
    assert (r4["tp"], r4["fp"], r4["fn"]) == (3, 1, 0)
    assert r4["recall"] == 1.0
    # best F1 lives at 0.8 (f1=0.8) vs 0.4 (f1≈0.857) → actually 0.4 wins
    best = max(got.values(), key=lambda r: r["f1"])
    assert best["threshold"] == 0.4


def test_average_precision_matches_sklearn_formula(spark):
    import numpy as np
    import pytest

    from pipes_spark.operators.linear_model import average_precision

    rng = np.random.RandomState(61)
    y = (rng.rand(500) < 0.2).astype(int)
    s = np.round(np.clip(y * 0.3 + rng.rand(500) * 0.7, 0, 1), 3)
    df = spark.createDataFrame(
        [(int(y[i]), float(s[i])) for i in range(500)], "y int, s double")
    r = average_precision(df, F.col("y") == 1, F.col("s")).collect()[0]
    # reference: AP = sum over ranked positives of precision at that rank,
    # computed on the grouped score domain (ties share one cutoff)
    order = np.argsort(-s, kind="stable")
    ss, yy = s[order], y[order]
    ap_terms, ctp, cfp = [], 0, 0
    i = 0
    while i < len(ss):
        j = i
        while j < len(ss) and ss[j] == ss[i]:
            j += 1
        np_here = int(yy[i:j].sum())
        ctp += np_here
        cfp += (j - i) - np_here
        ap_terms.append(np_here * ctp / (ctp + cfp))
        i = j
    expect = sum(ap_terms) / y.sum()
    assert r["avg_precision"] == pytest.approx(expect, abs=1e-5)
    assert r["n_pos"] == int(y.sum())
    # a random scorer's AP ≈ positive rate, far below this one
    assert r["avg_precision"] > 0.3
    # no positives → NULL
    neg = spark.createDataFrame([(0, 0.5), (0, 0.7)], "y int, s double")
    assert average_precision(neg, F.col("y") == 1, F.col("s")).collect()[0][
        "avg_precision"] is None


def test_grouped_minmax_arrow_scales_per_group(spark):
    """applyInArrow grouped map: per-group min-max scaling; a constant
    group has zero range and scales to 0.0 throughout; an all-NULL group
    yields NULL (matching the SQL window twin's CASE semantics)."""
    from pipes_spark.operators.udfs import grouped_minmax_arrow

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 15.0), (2, 4, 7.0), (2, 5, 7.0),
         (3, 6, None), (3, 7, None)],
        "user_id bigint, event_id bigint, value double",
    )
    got = {
        r["event_id"]: r["scaled"]
        for r in grouped_minmax_arrow(df, "user_id", "value").collect()
    }
    assert got[1] == 0.0 and got[2] == 1.0 and abs(got[3] - 0.5) < 1e-12
    assert got[4] == 0.0 and got[5] == 0.0  # zero-range group
    assert got[6] is None and got[7] is None  # all-NULL group
