"""Streaming-semantics tests (SURVEY.md §5.1 pattern 3): finite file-source
streams driven to completion with availableNow — the analog of the
reference's channel-close cascade ending a run."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pipes_spark.sources import load_table
from pipes_spark.streaming import (
    run_to_memory,
    session_window_agg,
    stream_dedup,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    """events table as a file-source stream (ts already µs timestamps)."""
    batch = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="pipes_stream_test_")
    batch.write.mode("overwrite").parquet(d)
    return spark.readStream.schema(batch.schema).parquet(d), batch


def test_tumbling_window_agg_matches_batch(spark, event_stream):
    stream, batch = event_stream
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", ["event_type"], {"value": "sum"}, watermark="10 minutes"
    )
    got = run_to_memory(agg, output_mode="append")
    want = batch.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        F.sum("value").alias("s")
    )
    got_n, want_n = got.count(), want.count()
    # append mode emits only watermark-closed windows; with availableNow over
    # one file everything except the final window per key closes
    assert got_n >= want_n - 5 * 2  # at most one open window per event_type
    joined = got.select(
        F.col("window.start").alias("h"), "event_type", F.col("sum_value").alias("s2")
    ).join(want, ["h", "event_type"])
    mismatched = joined.filter(F.abs(F.col("s") - F.col("s2")) > 1e-6).count()
    assert mismatched == 0


def test_sliding_window(spark, event_stream):
    stream, batch = event_stream
    agg = tumbling_window_agg(
        stream, "ts", "2 hours", ["event_type"], {"value": "count"}, slide="1 hour"
    )
    got = run_to_memory(agg, output_mode="complete")
    # every event lands in exactly 2 sliding windows
    total = got.agg(F.sum("count_value")).collect()[0][0]
    assert total == 2 * batch.count()


def test_session_window(spark, event_stream):
    stream, _ = event_stream
    agg = session_window_agg(stream, "ts", "30 minutes", ["user_id"], watermark="1 hour")
    got = run_to_memory(agg, output_mode="complete")
    assert got.count() > 0
    bad = got.filter(F.col("session.end") < F.col("session.start")).count()
    assert bad == 0


def test_stream_dedup(spark, event_stream):
    stream, batch = event_stream
    deduped = stream_dedup(stream, ["user_id", "event_type"], "ts", "1 hour")
    got = run_to_memory(deduped, output_mode="append")
    want = batch.select("user_id", "event_type").distinct().count()
    assert got.select("user_id", "event_type").distinct().count() == want
    assert got.count() == want


def test_streaming_matches_batch_sessionization_pipeline(spark, sf_dir):
    """Framework integration: a Pipeline whose final starts a streaming query
    and whose done() awaits it (Runner streaming path)."""
    from pipes_spark import Final, Middle, NodesMap, Pipeline, Start

    batch = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="pipes_stream_pipe_")
    batch.write.mode("overwrite").parquet(d)

    class StreamAgg(NodesMap):
        src = Start()
        win = Middle()
        sink = Final()

        def connect(self):
            self.src.send_to(self.win)
            self.win.send_to(self.sink)

    name = "pipe_stream_out"
    p = Pipeline(StreamAgg, spark=spark)
    p.add_start("src", lambda s: s.readStream.schema(batch.schema).parquet(d))
    p.add_middle(
        "win",
        lambda df: df.groupBy(F.window("ts", "1 hour").alias("w")).agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    p.add_final(
        "sink",
        lambda df: df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start(),
    )
    p.build().start().done()
    got = spark.table(name).agg(F.sum("n")).collect()[0][0]
    assert got == batch.count()


def test_stream_static_join_enrichment(spark, sf_dir, event_stream):
    from pipes_spark.streaming import stream_static_join

    stream, batch = event_stream
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream_static_join(stream, cust, stream.user_id == cust.c_custkey).select(
        "event_id", "c_mktsegment"
    )
    got = run_to_memory(joined, output_mode="append")
    want = batch.join(cust, batch.user_id == cust.c_custkey)
    assert got.count() == want.count()


def test_stateful_running_totals_matches_groupby(spark, event_stream):
    """applyInPandasWithState totals over a single finite batch == GROUP BY."""
    from pipes_spark.streaming import stateful_running_totals

    stream, batch = event_stream
    got = run_to_memory(stateful_running_totals(stream), output_mode="update")
    want = {
        r.user_id: (r.n, r.s)
        for r in batch.groupBy("user_id")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    rows = got.collect()
    assert len(rows) == len(want)
    for r in rows:
        n, s = want[r.user_id]
        assert r.total_n == n and abs(r.total_sum - s) < 1e-6


def test_transform_with_state_matches_groupby(spark, event_stream):
    """transformWithStateInPandas totals over one finite batch == GROUP BY
    (same contract as the applyInPandasWithState variant). The API's driver
    worker needs protobuf, absent in some environments — skip there."""
    pytest.importorskip("google.protobuf.descriptor")
    from pipes_spark.streaming import transform_with_state_totals

    stream, batch = event_stream
    got = run_to_memory(transform_with_state_totals(stream), output_mode="update")
    want = {
        r.user_id: (r.n, r.s)
        for r in batch.groupBy("user_id")
        .agg(F.count("value").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    rows = got.collect()
    assert len(rows) == len(want)
    for r in rows:
        n, s = want[r.user_id]
        assert r.total_n == n and abs(r.total_sum - s) < 1e-6


def test_streaming_rollup_writer_matches_batch_rollup(spark, sf_dir):
    """The stream-maintained rollup table must agree exactly with the batch
    hourly rollup on every finalized hour, and must contain every hour
    strictly older than the watermark bound (append mode emits each window
    exactly once, whole hours per batch → partition overwrite is safe)."""
    import datetime

    from pipes_spark.catalog import _events_stream
    from pipes_spark.operators.rollup import hourly_rollup, streaming_rollup_writer
    from pipes_spark.sources import load_table

    table = "rollup_stream_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        q = streaming_rollup_writer(_events_stream(spark, sf_dir), table, watermark="2 hours")
        q.awaitTermination()
        got = {
            (r.hour, r.event_type): (r.n_events, float(r.value_sum), r.value_min, r.value_max)
            for r in spark.table(table).collect()
        }
        assert got, "no finalized hours were written"
        events = load_table(spark, sf_dir, "events")
        batch = {
            (r.hour, r.event_type): (r.n_events, float(r.value_sum), r.value_min, r.value_max)
            for r in hourly_rollup(events).collect()
        }
        # everything written must exactly match the batch rollup
        for k, v in got.items():
            assert batch[k] == v, k
        # completeness: every hour strictly inside the watermark bound is present
        max_ts = events.agg(F.max("ts")).first()[0]
        cutoff = max_ts - datetime.timedelta(hours=3, minutes=1)
        expected_keys = {k for k in batch if k[0] + datetime.timedelta(hours=1) <= cutoff}
        assert expected_keys <= set(got)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_max_files_per_trigger_bounds_batches(spark, sf_dir, tmp_path):
    """Source-side backpressure (the ChannelBufferLen analog): with
    maxFilesPerTrigger=1, a 3-file directory must ingest as 3 micro-batches
    of bounded size, not one giant batch."""
    from pipes_spark.sources import load_table
    from pipes_spark.streaming import read_stream_parquet

    src = str(tmp_path / "files")
    orders = load_table(spark, sf_dir, "orders").limit(300)
    orders.repartition(3).write.parquet(src)

    batches = []
    stream = read_stream_parquet(
        spark, src, orders.schema, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: batches.append(df.count())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(batches) == 3
    assert sum(batches) == 300
    assert all(b < 300 for b in batches)


def test_stream_generator_recovers_from_checkpoint_exactly_once(spark, tmp_path):
    """Stop a generator-source query mid-stream and restart from the same
    checkpoint: the offset log + readBetweenOffsets replay must deliver
    every offset exactly once into the (fault-tolerant) file sink."""
    import time

    from pipes_spark.sources import stream_generator_source

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def sgen(lo, hi):
        return [(i,) for i in range(lo, hi)]

    def start():
        sdf = stream_generator_source(
            spark, sgen, "i long", rows_per_batch=60, max_offset=300
        )
        return (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    # let at least one batch commit, then kill mid-stream
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= 60:
                break
        except Exception:
            pass
        time.sleep(0.3)
    q.stop()

    q2 = start()
    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.read.parquet(out).count() >= 300:
            break
        time.sleep(0.3)
    q2.stop()

    got = sorted(r.i for r in spark.read.parquet(out).collect())
    assert got == list(range(300))  # no loss, no duplicates


def test_stream_upsert_latest_merges_across_batches(spark, tmp_path):
    """CDC apply: three single-file micro-batches (maxFilesPerTrigger=1);
    later batches overwrite earlier keys, untouched keys survive."""
    from pipes_spark.streaming import stream_upsert_latest

    d = str(tmp_path / "cdc")
    schema = "k long, ts long, v string"
    batches = [
        [(1, 10, "a1"), (2, 10, "b1")],
        [(2, 20, "b2"), (3, 5, "c1"), (3, 6, "c2")],  # in-batch: newest wins
        [(1, 30, "a3"), (4, 1, "d1")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{d}/b{i}")
    files = sorted(
        f"{d}/b{i}/{f}"
        for i in range(3)
        for f in os.listdir(f"{d}/b{i}")
        if f.endswith(".parquet")
    )
    stream_dir = str(tmp_path / "stream_in")
    os.makedirs(stream_dir)
    # one file per micro-batch, named in batch order
    for i, f in enumerate(files):
        os.symlink(os.path.abspath(f), f"{stream_dir}/{i:03d}.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(stream_dir)
    )
    out = {r.k: (r.ts, r.v) for r in stream_upsert_latest(stream, ["k"], ["ts"]).collect()}
    assert out == {1: (30, "a3"), 2: (20, "b2"), 3: (6, "c2"), 4: (1, "d1")}


def test_stateful_forward_fill_carries_state_across_batches(spark, tmp_path):
    """Forward fill must carry the last-seen value BETWEEN micro-batches:
    three single-file ordered batches; key 1's fill from batch 0 must
    reach its null in batch 2, and a value updated in batch 1 must win."""
    from pipes_spark.streaming import run_to_memory, stateful_forward_fill

    schema = "event_id long, ts timestamp, user_id long, pv double"
    batches = [
        [(1, "2024-01-01 00:00:00", 1, 10.0), (2, "2024-01-01 00:00:01", 2, None)],
        [(3, "2024-01-01 00:01:00", 1, None), (4, "2024-01-01 00:01:01", 2, 5.0)],
        [(5, "2024-01-01 00:02:00", 1, None), (6, "2024-01-01 00:02:01", 2, None)],
    ]
    src = tmp_path / "ffill_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(e, __import__("datetime").datetime.fromisoformat(t), u, v) for e, t, u, v in rows],
            schema,
        )
        df.coalesce(1).write.parquet(str(tmp_path / f"b{i}"))
        part = next(p for p in (tmp_path / f"b{i}").iterdir() if p.name.endswith(".parquet"))
        (src / f"{i:03d}.parquet").symlink_to(part)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    got = {
        r.event_id: r.value_ffill
        for r in run_to_memory(
            stateful_forward_fill(stream, "user_id", "ts", "pv", "value_ffill"),
            output_mode="append",
        ).collect()
    }
    assert got[1] == 10.0
    assert got[2] is None          # no value seen yet for key 2
    assert got[3] == 10.0          # carried from batch 0
    assert got[4] == 5.0
    assert got[5] == 10.0          # carried across two batch boundaries
    assert got[6] == 5.0           # updated in batch 1 wins


def test_stateful_forward_fill_survives_multi_chunk_groups(spark, tmp_path):
    """A group delivered as MULTIPLE Arrow chunks (maxRecordsPerBatch
    smaller than the group) must still fill in global (ts) order — the
    chunks arrive as an iterator and must be concatenated before sorting."""
    import datetime

    from pipes_spark.streaming import run_to_memory, stateful_forward_fill

    n = 60
    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i), 1,
         float(i) if i % 7 == 0 else None)
        for i in range(n)
    ]
    schema = "event_id long, ts timestamp, user_id long, pv double"
    d = str(tmp_path / "chunks")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        stream = spark.readStream.schema(schema).parquet(d)
        got = {
            r.event_id: r.value_ffill
            for r in run_to_memory(
                stateful_forward_fill(stream, "user_id", "ts", "pv", "value_ffill"),
                output_mode="append",
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(got) == n
    for i in range(n):
        want = float(i - i % 7)  # last multiple of 7 at or before i
        assert got[i] == want, (i, got[i], want)


def test_stateful_ewma_cross_batch_matches_pandas(spark, tmp_path):
    import os

    import pandas as pd

    from pipes_spark.streaming import stateful_ewma

    # two files -> two micro-batches; the recursion must carry state across
    # the batch boundary (rows 0-9 in batch 1, rows 10-19 in batch 2)
    rows = [(i, 7, float((i * 13) % 20)) for i in range(20)]
    d = str(tmp_path / "in")
    os.makedirs(d)
    spark.createDataFrame(
        [(i, u, v, i) for i, u, v in rows[:10]], "event_id long, user_id long, value double, ts long"
    ).coalesce(1).write.parquet(d + "/f0")
    spark.createDataFrame(
        [(i, u, v, i) for i, u, v in rows[10:]], "event_id long, user_id long, value double, ts long"
    ).coalesce(1).write.parquet(d + "/f1")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for sub in ("f0", "f1"):
        for f in sorted(os.listdir(f"{d}/{sub}")):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{sub}/{f}", f"{flat}/{n:02d}.parquet")
                n += 1
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    from pipes_spark.streaming import run_to_memory

    out = run_to_memory(
        stateful_ewma(stream, "user_id", "ts", "value", alpha=0.3),
        output_mode="append",
    )
    got = {r["event_id"]: r["value_ewma"] for r in out.collect()}
    exp = pd.Series([v for _, _, v in rows]).ewm(alpha=0.3, adjust=False).mean()
    assert len(got) == 20
    for i in range(20):
        assert got[i] == pytest.approx(round(float(exp[i]), 6), abs=1e-6), i


def test_stateful_holt_cross_batch_matches_recursion(spark, tmp_path):
    import os

    from pipes_spark.streaming import run_to_memory, stateful_holt

    # trending series split across two micro-batches: state (level, trend)
    # must carry over the boundary
    rows = [(i, 7, float(2 * i + ((i * 7) % 5))) for i in range(20)]
    d = str(tmp_path / "in")
    os.makedirs(d)
    spark.createDataFrame(
        [(i, u, v, i) for i, u, v in rows[:10]],
        "event_id long, user_id long, value double, ts long",
    ).coalesce(1).write.parquet(d + "/f0")
    spark.createDataFrame(
        [(i, u, v, i) for i, u, v in rows[10:]],
        "event_id long, user_id long, value double, ts long",
    ).coalesce(1).write.parquet(d + "/f1")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for sub in ("f0", "f1"):
        for f in sorted(os.listdir(f"{d}/{sub}")):
            if f.endswith(".parquet"):
                os.symlink(f"{d}/{sub}/{f}", f"{flat}/{n:02d}.parquet")
                n += 1
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    out = run_to_memory(
        stateful_holt(stream, "user_id", "ts", "value", alpha=0.3, beta=0.1),
        output_mode="append",
    )
    got = {r["event_id"]: (r["holt_level"], r["holt_forecast"]) for r in out.collect()}
    level, trend = None, None
    for i, (_, _, x) in enumerate(rows):
        if level is None:
            level, trend = x, 0.0
        else:
            prev = level
            level = 0.3 * x + 0.7 * (level + trend)
            trend = 0.1 * (level - prev) + 0.9 * trend
        assert got[i][0] == pytest.approx(round(level, 6), abs=1e-6), i
        assert got[i][1] == pytest.approx(round(level + trend, 6), abs=1e-6), i
    # Holt tracks the +2/step trend: late forecasts stay close to the series
    assert abs(got[19][1] - rows[19][2]) < 3.0


def test_read_checkpoint_state_contents(spark, tmp_path, sf_dir):
    """State Data Source: the checkpointed aggregation state must be
    readable as a batch DataFrame and reconcile with the stream's own
    per-key output."""
    import os

    from pipes_spark.sources import load_table
    from pipes_spark.streaming import read_checkpoint_state, read_state_metadata

    src = str(tmp_path / "in")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events").limit(500)
    ev.select("user_id", "value").coalesce(1).write.parquet(src + "/f0")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for f in sorted(os.listdir(src + "/f0")):
        if f.endswith(".parquet"):
            os.symlink(f"{src}/f0/{f}", f"{flat}/{n:02d}.parquet")
            n += 1
    stream = spark.readStream.schema("user_id long, value double").parquet(flat)
    counts = stream.groupBy("user_id").count()
    ckpt = str(tmp_path / "ckpt")
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(
            # the batch must be FULLY consumed or state-store commit
            # validation fails — a noop write touches every partition
            lambda df, bid: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    meta = read_state_metadata(spark, ckpt).collect()
    assert any(r["operatorName"] == "stateStoreSave" for r in meta)
    state = read_checkpoint_state(spark, ckpt).collect()
    got = {r["key"]["user_id"]: r["value"]["count"] for r in state}
    expect = {r["user_id"]: r["n"] for r in
              ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == expect


def test_transform_with_state_session_timers(spark, tmp_path):
    """Timer semantics, constructed: in-batch gap breaks close inline;
    the per-key event-time timer closes a key's last session only once
    the final watermark (max ts − delay) passes end + gap."""
    from pyspark.sql import functions as F

    from pipes_spark.streaming import run_to_memory, transform_with_state_sessions

    # user 1: sessions [5..50s] and [200..220s]; user 2: [10..40s]
    rows = [(1, 5), (1, 30), (1, 50), (1, 200), (1, 220), (2, 10), (2, 40)]
    d = str(tmp_path / "sess_src")
    spark.createDataFrame(
        [(u, t * 1000) for u, t in rows], "user_id bigint, ms bigint"
    ).select("user_id", F.timestamp_millis("ms").alias("ts")).write.parquet(d)
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .parquet(d)
        .withWatermark("ts", "10 seconds")
    )
    out = run_to_memory(
        transform_with_state_sessions(stream, "user_id", "ts", gap_ms=60_000),
        output_mode="append",
    )
    got = sorted(tuple(r) for r in out.collect())
    # watermark ends at 220s − 10s = 210s:
    # u1 [5..50] closes inline (200 breaks the gap); u1 [200..220] needs
    # 220+60 ≤ 210 — stays open, NOT emitted; u2 [10..40] timer-fires
    # (40+60=100 ≤ 210).
    assert got == [
        (1, 5000, 50000, 3),
        (2, 10000, 40000, 2),
    ]


def test_transform_with_state_initial_state_hydration(spark, tmp_path):
    """Warm-starting the stateful totals from a batch table: hydrated keys
    continue from their prior totals, fresh keys start from zero."""
    from pyspark.sql import functions as F

    from pipes_spark.streaming import run_to_memory, transform_with_state_totals

    d = str(tmp_path / "hydr_src")
    spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 1.0)], "user_id bigint, value double"
    ).write.parquet(d)
    prior = spark.createDataFrame(
        [(1, 4, 100.0), (9, 2, 50.0)], "user_id bigint, total_n bigint, total_sum double"
    )
    stream = spark.readStream.schema("user_id bigint, value double").parquet(d)
    out = run_to_memory(
        transform_with_state_totals(stream, "user_id", "value", initial_state=prior),
        output_mode="update",
    )
    got = {r["user_id"]: (r["total_n"], r["total_sum"]) for r in out.collect()}
    assert got[1] == (5, 110.0)  # hydrated + this batch
    assert got[2] == (1, 5.0) and got[3] == (1, 1.0)  # fresh keys


def test_transform_with_state_ttl_smoke(spark, tmp_path):
    """TTL plumbing on the modern API: a ttl_ms forces ProcessingTime
    mode (Spark rejects TTL under timeMode=None) and the stateful totals
    still compute within the batch. A TTL'd query is inherently
    long-running — wall-clock expiry keeps the trigger alive, so
    availableNow/run_to_memory would never terminate; drain with
    processAllAvailable() and stop the query explicitly instead.
    Cross-run wall-clock expiry itself is untestable deterministically."""
    from pipes_spark.streaming import transform_with_state_totals

    d = str(tmp_path / "ttl_src")
    spark.createDataFrame(
        [(1, 10.0), (1, 2.0), (2, 5.0)], "user_id bigint, value double"
    ).write.parquet(d)
    stream = spark.readStream.schema("user_id bigint, value double").parquet(d)
    q = (
        transform_with_state_totals(stream, "user_id", "value", ttl_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("ttl_smoke")
        .outputMode("update")
        .start()
    )
    try:
        # processAllAvailable() never quiesces either (the trigger keeps
        # firing zero-row batches for TTL upkeep) — poll until the data
        # batch has committed, then read and stop.
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and int(p.get("batchId", -1)) >= 1:
                break
            time.sleep(1)
        got = {
            r["user_id"]: (r["total_n"], r["total_sum"])
            for r in spark.table("ttl_smoke").collect()
        }
    finally:
        q.stop()
        spark.catalog.dropTempView("ttl_smoke")
    assert got == {1: (2, 12.0), 2: (1, 5.0)}


def _run_batches(df, checkpoint, output_mode="update"):
    """Drain a finite stream via foreachBatch, returning {batch_id: rows}."""
    captured = {}
    q = (
        df.writeStream.foreachBatch(
            lambda bdf, bid: captured.__setitem__(bid, bdf.collect())
        )
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return captured


def test_transform_with_state_topk_cross_batch(spark, tmp_path):
    """ListState top-k: the bounded per-key list must merge across
    micro-batches (k=3 survivors only), and equal values must tie-break
    on the higher event_id deterministically."""
    import os

    from pipes_spark.streaming import transform_with_state_topk

    schema = "user_id long, value double, event_id long"
    batches = [
        [(1, 5.0, 1), (1, 9.0, 2), (1, 7.0, 3), (1, 1.0, 4), (2, 4.0, 10)],
        [(1, 8.0, 5), (1, 2.0, 6), (1, 7.0, 7)],  # 7.0@7 ties 7.0@3 → id 7 wins
    ]
    src = tmp_path / "topk_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"tb{i}")
        )
        part = next(
            p for p in (tmp_path / f"tb{i}").iterdir() if p.name.endswith(".parquet")
        )
        (src / f"{i:03d}.parquet").symlink_to(part)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    got = _run_batches(
        transform_with_state_topk(stream, "user_id", "value", "event_id", k=3),
        str(tmp_path / "topk_ckpt"),
    )
    by_key = lambda bid: {
        u: [(r["rank"], r["value"], r["event_id"]) for r in sorted(got[bid], key=lambda r: r["rank"]) if r["user_id"] == u]
        for u in {r["user_id"] for r in got[bid]}
    }
    assert by_key(0) == {
        1: [(1, 9.0, 2), (2, 7.0, 3), (3, 5.0, 1)],
        2: [(1, 4.0, 10)],
    }
    # batch 1: only user 1 saw input; merged top-3 with the tie resolved to
    # the higher event_id
    assert by_key(1) == {1: [(1, 9.0, 2), (2, 8.0, 5), (3, 7.0, 7)]}


def test_transform_with_state_map_counts_cross_batch(spark, tmp_path):
    """MapState per-category counts: point updates must accumulate across
    micro-batches, untouched keys are not re-emitted."""
    from pipes_spark.streaming import transform_with_state_category_counts

    schema = "user_id long, event_type string"
    batches = [
        [(1, "a"), (1, "a"), (1, "b"), (2, "a")],
        [(1, "b"), (1, "c")],
    ]
    src = tmp_path / "mc_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / f"mb{i}")
        )
        part = next(
            p for p in (tmp_path / f"mb{i}").iterdir() if p.name.endswith(".parquet")
        )
        (src / f"{i:03d}.parquet").symlink_to(part)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    got = _run_batches(
        transform_with_state_category_counts(stream, "user_id", "event_type"),
        str(tmp_path / "mc_ckpt"),
    )
    shape = lambda bid: {
        u: {r["event_type"]: r["n"] for r in got[bid] if r["user_id"] == u}
        for u in {r["user_id"] for r in got[bid]}
    }
    assert shape(0) == {1: {"a": 2, "b": 1}, 2: {"a": 1}}
    assert shape(1) == {1: {"a": 2, "b": 2, "c": 1}}


def test_streaming_count_min_merge_equals_single_batch_sketch(spark, tmp_path):
    """The merged per-micro-batch sketches (maxFilesPerTrigger=1 over two
    files) are byte-identical to the one-shot batch sketch of all rows —
    micro-batch boundaries never change the result."""
    from pipes_spark.operators.rollup import count_min_sketch
    from pipes_spark.streaming import streaming_count_min

    schema = "item long"
    a = [(i % 7,) for i in range(60)]
    b = [(i % 11,) for i in range(40)]
    d = str(tmp_path / "cm")
    spark.createDataFrame(a, schema).coalesce(1).write.parquet(f"{d}/b0")
    spark.createDataFrame(b, schema).coalesce(1).write.parquet(f"{d}/b1")
    stream_dir = str(tmp_path / "cm_in")
    os.makedirs(stream_dir)
    files = sorted(
        f"{d}/b{i}/{f}"
        for i in range(2)
        for f in os.listdir(f"{d}/b{i}")
        if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        os.symlink(os.path.abspath(f), f"{stream_dir}/{i:03d}.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(stream_dir)
    )
    merged = streaming_count_min(stream, "item", depth=4, width=256)
    batch = count_min_sketch(
        spark.createDataFrame(a + b, schema), "item", depth=4, width=256
    )
    got = {(r.seed, r.bucket): r.cnt for r in merged.collect()}
    want = {(r.seed, r.bucket): r.cnt for r in batch.collect()}
    assert got == want and len(want) > 0


def test_streaming_kmv_merge_equals_single_batch_sketch(spark, tmp_path):
    """Per-micro-batch KMV sketches merged across a 2-file split equal the
    one-shot batch sketch row-for-row, and the estimate falls back to the
    exact count when distincts < k."""
    from pipes_spark.operators.rollup import kmv_estimate, kmv_sketch
    from pipes_spark.streaming import streaming_kmv_distinct

    schema = "item long"
    a = [(i,) for i in range(80)]
    b = [(i,) for i in range(50, 140)]  # overlap keeps distincts interesting
    d = str(tmp_path / "kmv")
    spark.createDataFrame(a, schema).coalesce(1).write.parquet(f"{d}/b0")
    spark.createDataFrame(b, schema).coalesce(1).write.parquet(f"{d}/b1")
    stream_dir = str(tmp_path / "kmv_in")
    os.makedirs(stream_dir)
    files = sorted(
        f"{d}/b{i}/{f}"
        for i in range(2)
        for f in os.listdir(f"{d}/b{i}")
        if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        os.symlink(os.path.abspath(f), f"{stream_dir}/{i:03d}.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(stream_dir)
    )
    merged = streaming_kmv_distinct(stream, "item", k=32)
    batch = kmv_sketch(spark.createDataFrame(a + b, schema), "item", k=32)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in batch.collect()
    )
    est = kmv_estimate(merged, k=32).first()
    assert est["n_sketch"] == 32 and est["est"] > 0
    # sub-k stream: estimate IS the exact distinct count
    small = kmv_estimate(
        kmv_sketch(spark.createDataFrame(a[:10], schema), "item", k=32), k=32
    ).first()
    assert small["n_sketch"] == 10 and small["est"] == 10.0


def test_streaming_upsert_idempotent_and_order_safe(spark, tmp_path):
    """Two-file split upsert equals the batch per-key argmax; replaying the
    whole stream into the existing table changes nothing (conditional
    merge never regresses); an OLDER row arriving later is ignored."""
    from pipes_spark.streaming import streaming_upsert_writer

    schema = "k long, ver long, payload string"
    b0 = [(1, 1, "a1"), (2, 5, "b5"), (3, 2, "c2")]
    b1 = [(1, 3, "a3"), (2, 4, "B-OLD"), (4, 1, "d1")]  # k=2 older: ignored
    d = str(tmp_path / "up")
    spark.createDataFrame(b0, schema).coalesce(1).write.parquet(f"{d}/b0")
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(f"{d}/b1")
    stream_dir = str(tmp_path / "up_in")
    os.makedirs(stream_dir)
    files = sorted(
        f"{d}/b{i}/{f}"
        for i in range(2)
        for f in os.listdir(f"{d}/b{i}")
        if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        os.symlink(os.path.abspath(f), f"{stream_dir}/{i:03d}.parquet")

    def run(ck):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(stream_dir)
        )
        return streaming_upsert_writer(
            stream, "t_upsert_test", keys=["k"], order_cols=["ver"],
            checkpointLocation=ck,
        )

    try:
        out = run(str(tmp_path / "ck1"))
        want = {(1, 3, "a3"), (2, 5, "b5"), (3, 2, "c2"), (4, 1, "d1")}
        assert {tuple(r) for r in out.collect()} == want
        # full replay with a fresh checkpoint: state must not change
        out2 = run(str(tmp_path / "ck2"))
        assert {tuple(r) for r in out2.collect()} == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_upsert_test")


def test_streaming_weighted_reservoir_merge_equals_batch_draw(spark, tmp_path):
    """Per-micro-batch A-ES top-k merged across a 2-file split equals
    the one-shot batch draw row-for-row (mergeability of the static
    rank), including when a group's global winners straddle batches."""
    from pipes_spark.operators.sampling import weighted_reservoir_per_group
    from pipes_spark.streaming import streaming_weighted_reservoir

    schema = "g string, id string, w double"
    a = [("x", f"a{i}", float(1 + i % 5)) for i in range(60)]
    b = [("x", f"b{i}", float(1 + i % 7)) for i in range(60)] + [
        ("y", f"c{i}", 1.0) for i in range(20)
    ]
    d = str(tmp_path / "wr")
    spark.createDataFrame(a, schema).coalesce(1).write.parquet(f"{d}/b0")
    spark.createDataFrame(b, schema).coalesce(1).write.parquet(f"{d}/b1")
    stream_dir = str(tmp_path / "wr_in")
    os.makedirs(stream_dir)
    files = sorted(
        f"{d}/b{i}/{f}"
        for i in range(2)
        for f in os.listdir(f"{d}/b{i}")
        if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        os.symlink(os.path.abspath(f), f"{stream_dir}/{i:03d}.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(stream_dir)
    )
    merged = streaming_weighted_reservoir(stream, ["g"], "id", "w", k=8)
    batch = weighted_reservoir_per_group(
        spark.createDataFrame(a + b, schema), ["g"], "id", "w", k=8
    )
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )
    # both groups fully represented: x at k, y at min(k, n)
    got = {}
    for r in merged.collect():
        got[r["g"]] = got.get(r["g"], 0) + 1
    assert got == {"x": 8, "y": 8}
