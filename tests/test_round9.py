"""Round-9 additions: persisted Kneser-Ney bigram model (warehouse
ingest artifact + delta append) and convergence early exit for the
iterative graph family."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# persisted KN bigram model
# ---------------------------------------------------------------------------


def test_kn_from_model_equals_inflight_fit(spark, sf_dir):
    """The persisted-model scorer is value-identical to refitting on the
    corpus — the contract the driver-graded twin query rides."""
    from pipes_spark.operators.text import (
        kneser_ney_perplexity,
        kneser_ney_perplexity_from_model,
    )
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import bigram_model_table

    docs = load_table(spark, sf_dir, "documents")
    counts = bigram_model_table(spark, sf_dir)
    a = sorted(tuple(r) for r in kneser_ney_perplexity(docs).collect())
    b = sorted(
        tuple(r) for r in kneser_ney_perplexity_from_model(docs, counts).collect()
    )
    assert a == b and len(a) > 0


def test_bigram_append_is_idempotent_and_delta_exact(spark, sf_dir):
    """Append-log maintenance: re-appending an ingested batch adds zero
    rows, and after a genuine delta the summed counts equal a fresh
    recount over the union corpus."""
    from pipes_spark.operators.text import _bigram_stream
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import append_bigram_counts, bigram_model_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 30)
    batch = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 50))

    tag = "t9kn_delta"
    # force a clean build for this tag even if a previous pytest process
    # left the managed tables on disk
    for t in (f"bigram_counts_documents_{tag}", f"bigram_docs_documents_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        from pipes_spark.warehouse import clear_stale_location

        clear_stale_location(spark, t)

    bigram_model_table(spark, sf_dir, corpus=base, tag=tag)
    after_delta = append_bigram_counts(spark, sf_dir, batch, tag=tag)
    n_rows_after_delta = after_delta.count()

    # idempotency: same batch again → zero new rows
    again = append_bigram_counts(spark, sf_dir, batch, tag=tag)
    assert again.count() == n_rows_after_delta

    # exactness: read-time compaction equals a fresh recount on the union
    summed = sorted(
        tuple(r)
        for r in after_delta.groupBy("w1", "w2")
        .agg(F.sum("c2").cast("bigint").alias("c2"))
        .collect()
    )
    _, big = _bigram_stream(base.unionByName(batch), "text", "doc_id")
    fresh = sorted(
        tuple(r)
        for r in big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .collect()
    )
    assert summed == fresh


# ---------------------------------------------------------------------------
# convergence early exit (iterative graph family)
# ---------------------------------------------------------------------------


def _two_cliques(spark):
    """Two disjoint triangles: LPA settles each to its min id in ~2
    rounds, far under the default budget."""
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_lpa_early_exit_identical_in_fewer_rounds(spark):
    from pipes_spark.operators.components import label_propagation

    e = _two_cliques(spark)
    stats: dict = {}
    fast = label_propagation(e, num_iter=10, early_exit=True, stats=stats)
    slow = label_propagation(e, num_iter=10, early_exit=False)
    assert sorted(tuple(r) for r in fast.collect()) == sorted(
        tuple(r) for r in slow.collect()
    )
    assert stats["converged"] and stats["rounds"] < 10, stats


def test_lpa_budget_cap_still_respected(spark):
    """A path graph keeps rippling labels: the budget, not convergence,
    ends the loop and stats reports that honestly."""
    from pipes_spark.operators.components import label_propagation

    n = 40
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    stats: dict = {}
    label_propagation(e, num_iter=2, early_exit=True, stats=stats).collect()
    assert stats["rounds"] == 2 and not stats["converged"], stats


def test_pagerank_tol_early_exit_on_converged_fixture(spark):
    """A directed cycle is PageRank's exact fixed point from the uniform
    start (every vertex keeps rank 1.0): round 1 measures delta 0 and
    the loop exits with ranks identical to the full-budget run."""
    from pipes_spark.operators.components import pagerank

    e = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    stats: dict = {}
    fast = pagerank(e, num_iter=10, tol=1e-9, stats=stats)
    slow = pagerank(e, num_iter=10)
    assert sorted(tuple(r) for r in fast.collect()) == sorted(
        tuple(r) for r in slow.collect()
    )
    assert stats["converged"] and stats["rounds"] == 1, stats


def test_pagerank_default_keeps_fixed_round_semantics(spark):
    """tol=None (the default every oracle encodes) must not early-exit
    even on a converged fixture."""
    from pipes_spark.operators.components import pagerank

    e = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], "src long, dst long"
    )
    stats: dict = {}
    pagerank(e, num_iter=7, stats=stats).collect()
    assert stats["rounds"] == 7 and not stats["converged"], stats


# ---------------------------------------------------------------------------
# driver-owned sessions: protobuf remediation for transformWithStateInPandas
# ---------------------------------------------------------------------------


def test_twsip_survives_session_created_before_import(tmp_path):
    """The correctness driver builds its SparkSession BEFORE importing
    this package, so TWS workers inherit a PYTHONPATH without the
    offline protobuf runtime — exactly the crash r9 fixed via
    session.worker_protobuf_ok (sc.environment PYTHONPATH injection: the
    TWS pre-init StreamingPythonRunner syncs no pyFiles, the
    PythonFunction envVars map is the only post-launch channel) plus
    streaming._ensure_tws_state_store (driver sessions default to the
    HDFS state store, which lacks column families). Run the hostile
    order in a subprocess (own cwd → own warehouse; no managed tables
    touched) and require the REAL TWS path to produce oracle-matching
    values."""
    import os
    import subprocess
    import sys
    import textwrap

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {root!r})
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "2")
                 .appName("twsip_hostile").getOrCreate())
        from pipes_spark.catalog import QUERIES
        from pipes_spark.session import _WORKER_PROTOBUF_STATE
        df = QUERIES["streaming_twsip"].fn(spark, {sf!r})
        rows = sorted(tuple(r) for r in df.collect())
        import duckdb
        want = sorted(duckdb.sql(
            "SELECT user_id, count(value), round(sum(value), 6) "
            "FROM read_parquet({sf!r} || '/events.parquet') GROUP BY user_id"
        ).fetchall())
        assert rows == want, (rows[:2], want[:2])
        # the probe must have actually run and passed (real TWS path,
        # not the applyInPandasWithState fallback)
        assert list(_WORKER_PROTOBUF_STATE.values()) == [True]
        print("HOSTILE_TWSIP_OK", len(rows))
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "HOSTILE_TWSIP_OK" in out.stdout, out.stdout[-800:] + out.stderr[-2000:]


def test_bigram_append_replays_half_applied_batch_without_double_count(spark, sf_dir):
    """Crash-safety: counts land in a partition keyed by a deterministic
    digest of the delta doc set (dynamic partition overwrite), registry
    appended LAST — so a process dying between the two writes retries
    into the SAME partition. Simulate the half-applied state (counts
    written, registry not) and require the retry to converge to the
    exact fresh recount."""
    from pipes_spark.operators.text import _bigram_stream
    from pipes_spark.sources import load_table
    from pipes_spark.warehouse import (
        append_bigram_counts,
        bigram_model_table,
        clear_stale_location,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 20)
    batch = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 35))

    tag = "t9kn_crash"
    name = f"bigram_counts_documents_{tag}"
    for t in (name, f"bigram_docs_documents_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        clear_stale_location(spark, t)
    bigram_model_table(spark, sf_dir, corpus=base, tag=tag)

    # replicate exactly what a process that died between the counts
    # insert and the registry append left behind
    batch_id = batch.agg(
        F.md5(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))
            )
        ).alias("d")
    ).collect()[0]["d"]
    _, big = _bigram_stream(batch, "text", "doc_id")
    half = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .withColumn("_batch", F.lit(batch_id))
        .select("w1", "w2", "c2", "_batch")
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    half.write.insertInto(name, overwrite=True)

    # the retry: must replace the half-applied partition, not add to it
    refreshed = append_bigram_counts(spark, sf_dir, batch, tag=tag)
    summed = sorted(
        tuple(r)
        for r in refreshed.groupBy("w1", "w2")
        .agg(F.sum("c2").cast("bigint").alias("c2"))
        .collect()
    )
    _, big2 = _bigram_stream(base.unionByName(batch), "text", "doc_id")
    fresh = sorted(
        tuple(r)
        for r in big2.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .collect()
    )
    assert summed == fresh
