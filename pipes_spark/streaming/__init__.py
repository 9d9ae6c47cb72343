"""Structured Streaming operators (SURVEY.md §2.C streaming rows).

These realize the reference's "source emits during an indefinite amount of
time" contract (ref: pipe/node.go:12-14) that batch cannot: unbounded
sources, event-time windows with watermarks, stream dedup, and per-key
arbitrary state (the stateful-MiddleFunc analog).

For finite verification the helpers accept any streaming DataFrame and the
tests drive them with file sources + ``availableNow``/``processAllAvailable``
into memory sinks — the analog of the reference's channel-close cascade
ending a run (ref: pipe/internal/connect/connectors.go:36-41).
"""

from __future__ import annotations

import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: final micro-batch EXECUTED plans of finite streaming runs, appended by
#: ``record_executed_plan`` — the streaming window-lint hook: batch queries
#: are screened for one-task data-sized Window sorts at construction time
#: (tests/test_plans.py), but a streaming plan only exists per micro-batch,
#: so the lint instead reads what actually executed. Bounded ring; tests
#: clear it, run a streaming query, and lint what was captured.
EXECUTED_MICROBATCH_PLANS: "list[tuple[str, str]]" = []


def record_executed_plan(q) -> None:
    """Record a finished StreamingQuery's last micro-batch executed plan
    (the final IncrementalExecution of an availableNow drain). A query
    that never ran a batch has no lastExecution — py4j surfaces that as
    an exception and nothing is recorded; the lint test asserts a
    non-empty capture per query so a silent capture regression shows."""
    try:
        # _jsq is a StreamingQueryWrapper (interface proxy); lastExecution
        # lives on the underlying StreamExecution behind streamingQuery()
        plan = q._jsq.streamingQuery().lastExecution().executedPlan().toString()
    except Exception:
        return
    if plan:
        EXECUTED_MICROBATCH_PLANS.append((q.name or str(q.id), plan))
        del EXECUTED_MICROBATCH_PLANS[:-64]


def _await_and_record(q) -> None:
    q.awaitTermination()
    record_executed_plan(q)


def read_stream_parquet(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: Optional[int] = None,
    max_bytes_per_trigger: Optional[str] = None,
) -> DataFrame:
    """File-based streaming source.

    ``max_files_per_trigger`` / ``max_bytes_per_trigger`` bound how much
    each micro-batch ingests — the engine's source-side backpressure knob
    and the closest analog of the reference's ``ChannelBufferLen``
    (ref: pipe/options.go:12-22): pipes bounds in-flight elements per edge;
    Spark bounds in-flight data per trigger. At scale this is what keeps a
    backfill over years of files from planning one giant first batch."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger is not None:
        r = r.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return r.parquet(path)


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window_len: str,
    keys: list[str],
    aggs: dict[str, str],
    watermark: Optional[str] = None,
    slide: Optional[str] = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` given) event-time window
    aggregation with optional bounded-lateness watermark."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window_len, slide) if slide else F.window(ts_col, window_len)
    exprs = [getattr(F, how)(col).alias(f"{how}_{col}") for col, how in aggs.items()]
    return df.groupBy(win.alias("window"), *keys).agg(*exprs)


def session_window_agg(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], watermark: str
) -> DataFrame:
    """Session windows with an inactivity ``gap`` (streaming analog of the
    batch sessionize operator)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("session"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def stream_dedup(df: DataFrame, keys: list[str], ts_col: str, watermark: str) -> DataFrame:
    """Streaming exact dedup within the watermark horizon."""
    return df.withWatermark(ts_col, watermark).dropDuplicates(keys)


def stream_dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Bounded-state streaming dedup via ``dropDuplicatesWithinWatermark``:
    duplicates are dropped when they arrive within the watermark delay of
    the first occurrence, and each key's state is EVICTED once the
    watermark passes it — unlike ``dropDuplicates`` (whose keyed state
    with a watermark only evicts when the event-time column is part of
    the key), this guarantees bounded state for keys that recur forever.
    The contract matches at-least-once sources (a Kafka retry lands
    seconds later, well within the horizon), not the unbounded-lookback
    corpus store (see :func:`stream_dedup_against_store` for that).
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_static_join(
    stream_df: DataFrame, static_df: DataFrame, on, how: str = "inner", broadcast: bool = True
) -> DataFrame:
    """Stream-static enrichment join. The static side is broadcast by
    default — the standard shape for dimension enrichment at scale (the
    stream never shuffles; each micro-batch probes the replicated dim)."""
    right = F.broadcast(static_df) if broadcast else static_df
    return stream_df.join(right, on, how)


def stateful_running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    out_col_prefix: str = "total",
) -> DataFrame:
    """Per-key arbitrary state across micro-batches via
    ``applyInPandasWithState`` — the streaming analog of a stateful
    ``MiddleFunc`` (ref: pipe/node.go:16-19): user code owns a state object
    that survives between batches. Emits the running (count, sum) per key
    once per batch it appears in.

    Scale: state lives in the state store partitioned by key; each batch
    shuffles only that batch's rows on the key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} bigint, {out_col_prefix}_n bigint, {out_col_prefix}_sum double"
    state_schema = "n bigint, s double"

    def update(key, pdfs, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(pdf[value_col].count())
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], f"{out_col_prefix}_n": [n], f"{out_col_prefix}_sum": [s]})

    return df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: Optional[str] = None,
) -> DataFrame:
    """Run a (finite) streaming query to completion into a memory sink and
    return the materialized result as a batch DataFrame. This is the
    ``runner.done()`` path for finite streams."""
    name = query_name or f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q)
    spark = stream_df.sparkSession
    # memory-sink rows live in the driver heap behind this temp view; drop
    # it when the NEXT declared query begins (the result has been read by
    # then) so a long gate/bench session doesn't accumulate every
    # streaming query's materialized output
    from ..caching import register_scope_cleanup

    register_scope_cleanup(lambda: spark.catalog.dropTempView(name))
    return spark.table(name)


def read_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    **options,
) -> DataFrame:
    """Kafka source (value as string). Untestable in this environment (no
    broker); the wrapper exists so pipelines declare the same graph locally
    (file/rate source) and on a cluster (Kafka) by swapping one provider —
    exactly the reference's provider-conditional-assembly pattern
    (ref: pipe/providers.go:47-152)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load().withColumn("value", F.col("value").cast("string"))


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    cond,
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: both sides watermarked so the state store can
    evict rows once the time-range condition can no longer match — the
    requirement for bounded state in an unbounded join. ``cond`` must
    include the event-time range constraint."""
    return left.withWatermark(left_ts, left_watermark).join(
        right.withWatermark(right_ts, right_watermark), cond, how
    )


def _ensure_tws_state_store(df: DataFrame) -> None:
    """``transformWithStateInPandas`` requires a state-store provider with
    column-family support (stock option: RocksDB). The engine's own
    session factory sets it at build time (session.py); a DRIVER-OWNED
    session (the correctness gate) arrives with the HDFS-backed default,
    which throws UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES
    at query start. The conf is a runtime-settable SQLConf read per query
    start — upgrade exactly the default case, leaving any deliberately
    configured custom provider untouched."""
    spark = df.sparkSession
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        cur = spark.conf.get(key)
    except Exception:
        cur = None
    if not cur or cur.endswith("HDFSBackedStateStoreProvider"):
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )


def transform_with_state_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ttl_ms: Optional[int] = None,
    initial_state: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-key running totals on the ``transformWithStateInPandas`` API —
    the successor to ``applyInPandasWithState``: named state variables with
    optional TTL, timers, and initial-state hydration. Functionally the
    same contract as ``stateful_running_totals`` so both stateful surfaces
    are exercised by the same oracle shape.

    NOTE: this API's driver worker imports protobuf; environments without a
    working ``google.protobuf`` fail at query start (the
    ``applyInPandasWithState`` variant has no such dependency).

    NOTE: passing ``ttl_ms`` makes the query inherently long-running —
    wall-clock TTL keeps the ProcessingTime trigger scheduling batches, so
    an availableNow run (``run_to_memory``) never terminates. Drain TTL'd
    queries with ``query.processAllAvailable()`` + ``query.stop()``.
    """
    _ensure_tws_state_store(df)
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class Totals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("totals", "n bigint, s double", ttl_ms)

        def handleInitialState(self, key, initialState, timerValues):
            # hydration: warm-start each key's running totals from a batch
            # table (``initial_state`` rows: key, total_n, total_sum) —
            # the migrate-a-running-aggregation-into-streaming path
            self._state.update(
                (int(initialState["total_n"]), float(initialState["total_sum"]))
            )

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += int(pdf[value_col].count())
                s += float(pdf[value_col].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {key_col: [key[0]], "total_n": [n], "total_sum": [s]}
            )

        def close(self):
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        Totals(),
        outputStructType=f"{key_col} bigint, total_n bigint, total_sum double",
        outputMode="Update",
        # TTL is wall-clock-based; Spark only permits it in ProcessingTime
        # mode, so the mode follows the ttl argument
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
        initialState=initial_state.groupBy(key_col) if initial_state is not None else None,
    )


def transform_with_state_topk(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    tie_col: str = "event_id",
    k: int = 3,
) -> DataFrame:
    """Per-key bounded top-k on ``transformWithStateInPandas`` using a
    **ListState** variable (the ValueState surface is
    :func:`transform_with_state_totals`): the state holds at most ``k``
    (value, tie) tuples per key — bounded regardless of stream length,
    which is the point of a streaming top-k versus buffering all rows.
    Ordering is (value desc, tie desc) so results are deterministic under
    ties. Each batch emits the key's refreshed top-k with 1-based ranks;
    a finite single-batch drain therefore equals the batch
    ``row_number() <= k`` query."""
    _ensure_tws_state_store(df)
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class TopK(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getListState("topk", "v double, tie bigint")

        def handleInputRows(self, key, rows, timerValues):
            cur = list(self._state.get()) if self._state.exists() else []
            for pdf in rows:
                sub = pdf[[value_col, tie_col]].dropna(subset=[value_col])
                cur.extend(
                    (float(v), int(t))
                    for v, t in zip(sub[value_col], sub[tie_col])
                )
            cur.sort(key=lambda p: (-p[0], -p[1]))
            cur = cur[:k]
            self._state.put(cur)
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(cur),
                    "rank": list(range(1, len(cur) + 1)),
                    value_col: [p[0] for p in cur],
                    tie_col: [p[1] for p in cur],
                }
            )

        def close(self):
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        TopK(),
        outputStructType=(
            f"{key_col} bigint, rank int, {value_col} double, {tie_col} bigint"
        ),
        outputMode="Update",
        timeMode="None",
    )


def transform_with_state_category_counts(
    df: DataFrame,
    key_col: str = "user_id",
    cat_col: str = "event_type",
) -> DataFrame:
    """Per-key per-category running counts on ``transformWithStateInPandas``
    using a **MapState** variable: one map entry per category under each
    key (point lookup + update per distinct category in the batch — no
    rewrite of the whole per-key state, which is what makes MapState the
    right variable shape for high-cardinality sub-keys). Each batch emits
    the full refreshed (category, n) map for keys that saw input; a finite
    single-batch drain equals the batch ``GROUP BY key, category``."""
    _ensure_tws_state_store(df)
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class CatCounts(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getMapState("counts", "cat string", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for cat, n in pdf.groupby(cat_col).size().items():
                    prev = self._state.getValue((cat,))
                    self._state.updateValue(
                        (cat,), (int(n) + (int(prev[0]) if prev else 0),)
                    )
            cats, counts = [], []
            for (cat,), (n,) in self._state.iterator():
                cats.append(cat)
                counts.append(int(n))
            yield pd.DataFrame(
                {key_col: [key[0]] * len(cats), cat_col: cats, "n": counts}
            )

        def close(self):
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        CatCounts(),
        outputStructType=f"{key_col} bigint, {cat_col} string, n bigint",
        outputMode="Update",
        timeMode="None",
    )


def stream_upsert_latest(
    stream_df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    query_name: Optional[str] = None,
) -> DataFrame:
    """Streaming CDC apply — the ``foreachBatch`` MERGE pattern: each
    micro-batch is reduced to its newest row per key (``row_number`` over
    ``order_cols`` descending, within the batch), then SCD1-merged
    (:func:`~pipes_spark.operators.relational.merge_upsert`) into the
    accumulated target. Runs the stream to completion (``availableNow``)
    and returns the final target.

    The target lives in a temp view re-materialized per batch via
    ``localCheckpoint`` — lineage is cut every batch, so plan depth and
    recovery cost do not grow with stream length. At warehouse scale the
    view becomes a Delta/Iceberg ``MERGE INTO`` (or partition-overwrite
    parquet); the per-batch reduce+merge logic is exactly this.
    """
    from pyspark.sql import Window

    from ..operators.relational import merge_upsert

    name = query_name or f"upsert_{uuid.uuid4().hex[:12]}"
    spark = stream_df.sparkSession
    qualified = f"global_temp.{name}"
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])

    # foreachBatch runs on a CLONED session per micro-batch — plain temp
    # views die with the clone, so the accumulated target lives in the
    # global_temp database (shared across sessions of the context)
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        bs = batch.sparkSession
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if bs.catalog.tableExists(qualified):
            merged = merge_upsert(bs.table(qualified), latest, keys)
        else:
            merged = latest
        merged.localCheckpoint(eager=True).createOrReplaceGlobalTempView(name)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q)
    if not spark.catalog.tableExists(qualified):  # empty stream → empty target
        return spark.createDataFrame([], stream_df.schema)
    return spark.table(qualified)


def stateful_forward_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "value_ffill",
) -> DataFrame:
    """Streaming forward fill: carry each key's last non-null value onto
    every subsequent event, ACROSS micro-batches — the canonical stateful
    ``MiddleFunc`` of the reference (a rolling last-seen-value per key,
    ref: pipe/node.go:16-19) as an ``applyInPandasWithState`` operator.
    The batch twin is ``operators.timeseries.forward_fill``.

    State per key is one (value,) tuple. Within a batch rows are sorted by
    event time before filling; across batches the state carries the fill
    forward (correct when ingestion is time-ordered per key — the file-
    source contract used here; out-of-order streams need event-time
    buffering via a watermark + sort in ``transformWithState`` timers).

    Scale: each batch shuffles only its own rows on the key; state is one
    scalar per key in the (RocksDB) state store.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} double"]
    )

    def fill(key, pdfs, state):
        (last,) = state.get if state.exists else (None,)
        # a group arrives as an ITERATOR of Arrow chunks (split at
        # maxRecordsPerBatch) in no guaranteed order — concatenate FIRST,
        # then sort once; per-chunk sorting would fill large groups in
        # arbitrary cross-chunk order
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((last,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ts_col, kind="stable", ignore_index=True
        )
        filled = []
        for v in pdf[value_col]:
            if v == v and v is not None:  # non-null, NaN-safe
                last = float(v)
            filled.append(last)
        state.update((last,))
        yield pdf.assign(**{out_col: filled})

    return df.groupBy(key_col).applyInPandasWithState(
        fill, out_schema, "last double", "append", GroupStateTimeout.NoTimeout
    )



def stateful_ewma(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    out_col: str = "value_ewma",
) -> DataFrame:
    """Streaming EWMA — the TRUE sequential recursion
    ``y_i = α·x_i + (1−α)·y_{i−1}``, per key, ACROSS micro-batches.

    The batch twin (``operators.timeseries.ewma``) approximates this with a
    bounded finite-impulse window because batch windows cannot recurse;
    streaming state CAN — the carried state is one (ewma,) scalar per key,
    updated row-by-row inside each Arrow batch. This is exactly the
    stateful ``MiddleFunc`` accumulation pattern of the reference
    (ref: pipe/node.go:16-19), with pandas ``ewm(adjust=False)`` semantics:
    the first observation seeds y₀ = x₀.

    Same ordering contract as ``stateful_forward_fill``: per-batch sort by
    event time, cross-batch correctness when ingestion is time-ordered per
    key. Scale: one scalar per key in the (RocksDB) state store; each
    batch shuffles only its own rows.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} double"]
    )

    def smooth(key, pdfs, state):
        (y,) = state.get if state.exists else (None,)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((y,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ts_col, kind="stable", ignore_index=True
        )
        out = []
        for v in pdf[value_col]:
            if v == v and v is not None:  # non-null, NaN-safe
                y = float(v) if y is None else alpha * float(v) + (1.0 - alpha) * y
            out.append(y)
        state.update((y,))
        yield pdf.assign(**{out_col: [round(x, 6) if x is not None else None for x in out]})

    return df.groupBy(key_col).applyInPandasWithState(
        smooth, out_schema, "ewma double", "append", GroupStateTimeout.NoTimeout
    )


def stream_dedup_against_store(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental corpus ingestion with a persistent fingerprint store —
    the streaming form of exact dedup: each micro-batch is (1) deduped
    within itself on the normalized 128-bit content fingerprint (keep
    lowest id), (2) anti-joined against every fingerprint ever admitted,
    and (3) its new fingerprints appended to the store. Unlike
    ``dropDuplicates``-within-watermark (bounded state, bounded lookback),
    the store remembers FOREVER — the semantics a training-corpus ingest
    needs: a document seen last month is still a duplicate today.

    Runs the stream to completion (``availableNow``) and returns the
    admitted rows. The accumulated state is fingerprints only (16 bytes a
    document, not the text). Each batch's admitted rows are materialized
    ONCE (``localCheckpoint``) and appended to a driver-held list — total
    materialized volume is O(admitted rows), never the O(B²) of
    re-checkpointing the full history every batch; the anti-join reads
    the already-materialized fingerprint parts. At warehouse scale the
    parts list becomes a fingerprint table and the anti-join+append
    becomes two statements against it (a Delta MERGE or
    insert-if-absent).
    """
    from functools import reduce

    from pyspark.sql import Window

    from ..operators.text import normalized_fingerprint

    spark = stream_df.sparkSession
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    # per-batch checkpointed parts, appended never rewritten
    admitted_parts: list[DataFrame] = []
    fp_parts: list[DataFrame] = []

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        fped = batch.withColumn("_fp", normalized_fingerprint(text_col))
        in_batch = (
            fped.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if fp_parts:
            store = reduce(DataFrame.unionByName, fp_parts)
            admitted = in_batch.join(store, "_fp", "left_anti")
        else:
            admitted = in_batch
        admitted = admitted.localCheckpoint(eager=True)
        admitted_parts.append(admitted.drop("_fp"))
        fp_parts.append(admitted.select("_fp"))

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q)
    if not admitted_parts:
        return spark.createDataFrame([], stream_df.schema)
    return reduce(DataFrame.unionByName, admitted_parts)


def stateful_trending_scores(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    half_life_seconds: float = 3600.0,
) -> DataFrame:
    """Streaming trending scores: per key, an exponentially time-decayed
    event count ``score = Σ 2^(−Δt/half_life)`` over everything seen so
    far — the "what's hot right now" metric (trending topics, surging
    error types, hot products). A raw running count never forgets; the
    half-life makes old activity fade smoothly without the cliff of a
    sliding window.

    State per key is TWO scalars (score, last event-time): on each batch
    the carried score decays by the time elapsed to each event and
    increments, row by row in event-time order — the classic
    decayed-counter fold, exactly the stateful MiddleFunc accumulation
    of the reference (ref: pipe/node.go:16-19). Emits one row per
    (key, batch) with the post-batch score and count — the consumer
    ranks the latest rows for the trending board.

    Same ordering contract as the other stateful operators (per-batch
    event-time sort; cross-batch correctness when ingestion is
    time-ordered per key); decay math uses the event times themselves,
    so batch boundaries do not affect the score.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key_col} string, score double, n_events bigint, last_ts timestamp"
    )

    def fold(key, pdfs, state):
        if state.exists:
            score, last_us, n = state.get
        else:
            score, last_us, n = 0.0, None, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((score, last_us, n))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ts_col, kind="stable", ignore_index=True
        )
        for t in pdf[ts_col]:
            t_us = int(t.value // 1000)  # pandas ns -> us
            if last_us is not None and t_us > last_us:
                dt = (t_us - last_us) / 1e6
                score *= math.pow(2.0, -dt / half_life_seconds)
            score += 1.0
            last_us = t_us if last_us is None else max(last_us, t_us)
            n += 1
        state.update((score, last_us, n))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "score": [round(score, 6)],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fold,
        out_schema,
        "score double, last_us bigint, n bigint",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stateful_threshold_alerts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Edge-triggered threshold alerting: emit one alert when a key's
    value CROSSES the threshold upward (and a recovery when it crosses
    back down) — not a row per sample while above, which is the
    difference between an alert stream and a noise stream. State per
    key is one boolean (was-above); rows inside each batch are folded
    in event-time order and only the transitions are emitted.

    The same cross-batch contract as the other stateful operators: the
    carried flag survives micro-batches, so a value that goes high in
    one batch and stays high in the next produces exactly one alert.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key_col} string, ts timestamp, value double, alert string"
    )

    def detect(key, pdfs, state):
        (above,) = state.get if state.exists else (False,)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((above,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ts_col, kind="stable", ignore_index=True
        )
        out_ts, out_v, out_a = [], [], []
        for t, v in zip(pdf[ts_col], pdf[value_col]):
            now_above = bool(v > threshold)
            if now_above and not above:
                out_ts.append(t); out_v.append(float(v)); out_a.append("raised")
            elif not now_above and above:
                out_ts.append(t); out_v.append(float(v)); out_a.append("recovered")
            above = now_above
        state.update((above,))
        if out_ts:
            yield pd.DataFrame(
                {
                    key_col: key[0],
                    "ts": out_ts,
                    "value": out_v,
                    "alert": out_a,
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        detect, out_schema, "above boolean", "append", GroupStateTimeout.NoTimeout
    )


def stateful_cusum(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    target: float = 0.0,
    slack: float = 0.0,
    threshold: float = 0.0,
    out_col: str = "cusum",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Streaming one-sided CUSUM — S_i = max(0, S_{i−1} + x_i − target −
    slack) per key, ACROSS micro-batches, with an ``alert`` flag above the
    decision interval. The live twin of ``operators.timeseries.cusum``
    (which computes the identical recursion in batch via the prefix-min
    closed form): carried state is ONE scalar per key, so a drift alarm
    fires mid-stream instead of at the next batch job.

    Same ordering contract as ``stateful_ewma``: per-batch sort by event
    time after concatenating the Arrow chunks (chunks arrive unordered);
    cross-batch correctness when ingestion is time-ordered per key. One
    scalar per key in the (RocksDB) state store.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} double", "alert boolean"]
    )

    def step(key, pdfs, state):
        (s,) = state.get if state.exists else (0.0,)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((s,))
            return
        order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            order, kind="stable", ignore_index=True
        )
        out = []
        for v in pdf[value_col]:
            if v == v and v is not None:
                s = max(0.0, s + float(v) - target - slack)
            out.append(round(s, 6))
        state.update((s,))
        yield pdf.assign(
            **{out_col: out, "alert": [x > threshold for x in out]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        step, out_schema, "s double", "append", GroupStateTimeout.NoTimeout
    )


def progress_summary(query) -> list[dict]:
    """Operational readout of a streaming query's recent progress: one
    dict per micro-batch with the numbers an operator actually watches —
    input volume/rate, batch duration, watermark, and per-stateful-op
    state rows/memory (the state store is the thing that grows when a
    watermark is mis-set; surfacing it is how you catch that before the
    cluster does).

    Pure driver-side introspection of ``recentProgress`` — no jobs, no
    actions; call any time, including after ``awaitTermination``."""
    out = []
    for p in query.recentProgress:
        state = [
            {
                "operator": s.get("operatorName"),
                "state_rows": s.get("numRowsTotal"),
                "state_memory_bytes": s.get("memoryUsedBytes"),
                "rows_dropped_by_watermark": s.get("numRowsDroppedByWatermark"),
            }
            for s in (p.get("stateOperators") or [])
        ]
        out.append(
            {
                "batch_id": p.get("batchId"),
                "num_input_rows": p.get("numInputRows"),
                "input_rows_per_sec": p.get("inputRowsPerSecond"),
                "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
                "state": state,
            }
        )
    return out


def stateful_holt(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Streaming Holt (double exponential) smoothing — the level+trend
    recursion

        level_i = α·x_i + (1−α)·(level_{i−1} + trend_{i−1})
        trend_i = β·(level_i − level_{i−1}) + (1−β)·trend_{i−1}

    per key, ACROSS micro-batches, emitting the smoothed level and the
    one-step-ahead forecast ``level + trend``. Where EWMA tracks a slowly
    drifting mean, Holt follows a trending series without lag — the live
    form of short-horizon load/throughput forecasting. No batch window
    can express the recursion; the carried state is TWO scalars per key
    (level, trend), pandas-``ewm``-style seeding (level₀ = x₀,
    trend₀ = 0). Same ordering contract and RocksDB state-store scale
    shape as ``stateful_ewma`` (ref: pipe/node.go:16-19 — the stateful
    MiddleFunc accumulation pattern).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["holt_level double", "holt_forecast double"]
    )

    def smooth(key, pdfs, state):
        level, trend = state.get if state.exists else (None, None)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((level, trend))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ts_col, kind="stable", ignore_index=True
        )
        levels, forecasts = [], []
        for v in pdf[value_col]:
            if v == v and v is not None:  # non-null, NaN-safe
                x = float(v)
                if level is None:
                    level, trend = x, 0.0
                else:
                    prev = level
                    level = alpha * x + (1.0 - alpha) * (level + trend)
                    trend = beta * (level - prev) + (1.0 - beta) * trend
            levels.append(level)
            forecasts.append(None if level is None else level + trend)
        state.update((level, trend))
        yield pdf.assign(
            holt_level=[round(x, 6) if x is not None else None for x in levels],
            holt_forecast=[round(x, 6) if x is not None else None for x in forecasts],
        )

    return df.groupBy(key_col).applyInPandasWithState(
        smooth,
        out_schema,
        "level double, trend double",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def read_checkpoint_state(
    spark,
    checkpoint_location: str,
    operator_id: int = 0,
    batch_id: Optional[int] = None,
) -> DataFrame:
    """Read a stateful streaming query's CHECKPOINTED STATE as a batch
    DataFrame (the State Data Source): the post-mortem/debugging view of
    what the state store actually holds — audit watermark eviction,
    inspect a hot key's accumulated state, or reconcile state against
    the emitted output without touching the running query.
    ``progress_summary`` shows state SIZE per batch; this shows the
    CONTENT. Pass ``batch_id`` to time-travel to an earlier micro-batch
    (default: latest committed)."""
    r = (
        spark.read.format("statestore")
        .option("path", checkpoint_location)
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load()


def read_state_metadata(spark, checkpoint_location: str) -> DataFrame:
    """Operator-level metadata of a checkpoint (the state-metadata
    source): which stateful operators exist, their state store names,
    partition counts, and the min/max batch ids still readable — the
    index you consult before ``read_checkpoint_state``."""
    return (
        spark.read.format("state-metadata")
        .option("path", checkpoint_location)
        .load()
    )


def transform_with_state_sessions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Event-time session finalization with TIMERS on
    ``transformWithStateInPandas`` — the surface the older
    ``applyInPandasWithState`` cannot express: a per-key event-time timer
    re-registered at ``last_event + gap`` closes the open session when the
    WATERMARK passes it, so idle sessions emit without waiting for the
    key's next event. In-batch gap breaks close inline; the timer handles
    the tail.

    Emission is deterministic for a finite run: every session except a
    key's last closes inline, and the last closes iff
    ``end + gap <= final watermark`` (max event time − delay) — the batch
    twin is plain sessionization filtered at that cutoff, which is the
    SQL oracle. Input must carry a watermark (timeMode="EventTime").
    Chunks per key arrive unordered — concat first, sort once (CLAUDE.md).
    Derived columns must not start with an underscore: the Arrow
    transfer into the stateful worker renames them positionally.

    Scale: state is one (start, last, n) triple + one live timer per key
    in the state store; each batch shuffles only its own rows by key.
    """
    _ensure_tws_state_store(df)
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    out_schema = f"{key_col} bigint, start_ms bigint, end_ms bigint, n_events bigint"

    class Sessions(StatefulProcessor):
        def init(self, handle):
            self.h = handle
            self.s = handle.getValueState(
                "sess", "start_ms bigint, last_ms bigint, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts_ms_drv")
            cur = self.s.get() if self.s.exists() else None
            closed = []
            for t in pdf["ts_ms_drv"].tolist():
                t = int(t)
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] <= gap_ms:
                    cur = (cur[0], t, cur[2] + 1)
                else:
                    closed.append(cur)
                    cur = (t, t, 1)
            self.s.update(cur)
            # one live timer per key: replace any previous registration
            for texp in self.h.listTimers():
                self.h.deleteTimer(texp)
            self.h.registerTimer(cur[1] + gap_ms)
            if closed:
                yield pd.DataFrame(
                    {
                        key_col: [key[0]] * len(closed),
                        "start_ms": [c[0] for c in closed],
                        "end_ms": [c[1] for c in closed],
                        "n_events": [c[2] for c in closed],
                    }
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self.s.exists():
                st = self.s.get()
                self.s.clear()
                yield pd.DataFrame(
                    {
                        key_col: [key[0]],
                        "start_ms": [st[0]],
                        "end_ms": [st[1]],
                        "n_events": [st[2]],
                    }
                )

        def close(self):
            pass

    # NOTE: leading-underscore derived names arrive in the worker as
    # positional Arrow fields (_6) — use a plain name
    keyed = df.withColumn("ts_ms_drv", F.unix_millis(F.col(ts_col)))
    return keyed.groupBy(key_col).transformWithStateInPandas(
        Sessions(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
    )


def streaming_count_min(
    stream_df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Streaming Count-Min: sketch each micro-batch independently, merge
    across batches (rollup.count_min_merge) — the sketch's mergeability
    makes the result IDENTICAL to the batch sketch of the full stream no
    matter how the engine splits micro-batches, so frequency estimates
    from a live ingest equal the offline ones. Per-batch state is the
    bounded depth×width (seed, bucket, cnt) table (`localCheckpoint`ed —
    a few KB a batch), never the rows. Runs the stream to completion
    (``availableNow``) and returns the merged sketch."""
    from ..operators.rollup import count_min_merge, count_min_sketch

    spark = stream_df.sparkSession
    parts: list[DataFrame] = []

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        sk = count_min_sketch(batch, item_col, depth, width)
        parts.append(sk.localCheckpoint(eager=True))

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q)
    if not parts:
        return spark.createDataFrame([], "seed bigint, bucket bigint, cnt bigint")
    return count_min_merge(*parts)


def streaming_kmv_distinct(
    stream_df: DataFrame, key_col: str, k: int = 64
) -> DataFrame:
    """Streaming KMV distinct sketch: each micro-batch keeps its own k
    smallest key hashes (≤ k rows of state, `localCheckpoint`ed), merged
    across batches — mergeability makes the final sketch IDENTICAL to
    the offline batch sketch of the full stream for ANY micro-batch
    split, so live distinct-count estimates equal the offline ones
    (the rollup.kmv_merge contract; the streaming_count_min shape).
    Runs the stream to completion (availableNow) and returns the merged
    ≤ k-row sketch."""
    from ..operators.rollup import kmv_merge, kmv_sketch

    spark = stream_df.sparkSession
    parts: list[DataFrame] = []

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        sk = kmv_sketch(batch, key_col, k=k)
        parts.append(sk.localCheckpoint(eager=True))

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q)
    if not parts:
        return spark.createDataFrame([], "h bigint")
    return kmv_merge(*parts, k=k)


def streaming_upsert_writer(
    stream_df: DataFrame,
    table: str,
    keys: "list[str]",
    order_cols: "list[str]",
    **trigger,
):
    """Streaming keyed upsert (CDC-style MERGE) into a managed table:
    each micro-batch reduces to one winner per key (max ``order_cols``,
    compared lexicographically), then conditionally merges into the
    table — a source row replaces the target row ONLY if its order key
    is >= the stored one, so replayed or out-of-order batches can never
    regress state: the writer is idempotent under micro-batch replay by
    construction (the exactly-once argument foreachBatch sinks need).

    The merged result is localCheckpoint-ed before the overwrite because
    Spark refuses to overwrite a table its own plan is reading. At
    100 TB the overwrite becomes MERGE INTO on a transactional table
    format; the batch-side algebra (per-key winner + conditional merge)
    is exactly this. Runs to completion (availableNow unless a trigger
    is supplied) and returns the final table DataFrame.
    """
    from functools import reduce

    from pyspark.sql import Window

    spark = stream_df.sparkSession

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if spark.catalog.tableExists(table):
            tgt = spark.table(table).alias("t")
            src = latest.alias("s")
            cond = None
            for k in keys:
                c = F.col(f"t.{k}") == F.col(f"s.{k}")
                cond = c if cond is None else (cond & c)
            s_ord = F.struct(*[F.col(f"s.{c}") for c in order_cols])
            t_ord = F.struct(*[F.col(f"t.{c}") for c in order_cols])
            # NULL-guarded ordering: a NULL order field makes the struct
            # comparison evaluate to NULL, which would pin the target row
            # forever (a NULL-keyed insert could never be replaced by a
            # later row with a real order key). When the comparison is
            # indeterminate, the source wins iff ITS order key is complete
            # and the target's is not; both-incomplete keeps the target
            # (stable under replay).
            s_null = reduce(
                lambda a, b: a | b,
                [F.col(f"s.{c}").isNull() for c in order_cols],
            )
            t_null = reduce(
                lambda a, b: a | b,
                [F.col(f"t.{c}").isNull() for c in order_cols],
            )
            take_src = F.col(f"s.{keys[0]}").isNotNull() & (
                F.col(f"t.{keys[0]}").isNull()
                | F.coalesce(s_ord >= t_ord, t_null & ~s_null)
            )
            cols = [
                F.when(take_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                for c in batch.columns
            ]
            merged = tgt.join(src, cond, "full_outer").select(*cols)
        else:
            merged = latest
        merged.localCheckpoint(eager=True).write.mode("overwrite").saveAsTable(
            table
        )

    writer = stream_df.writeStream.foreachBatch(apply_batch)
    checkpoint = trigger.pop("checkpointLocation", None)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    else:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    _await_and_record(q)
    return spark.table(table)


def streaming_weighted_reservoir(
    stream_df: DataFrame,
    group_cols: "list[str]",
    key_col: str,
    weight_col: str,
    k: int = 10,
    salt: str = "",
) -> DataFrame:
    """Weighted reservoir (A-ES) under streaming ingest: each micro-batch
    keeps its own per-group top-k by the A-ES rank (≤ k rows per group
    of state, `localCheckpoint`ed), merged at the end by the SAME
    selection. The A-ES rank ln(u)/w is a pure static function of
    (key, weight), so top-k is mergeable: any row in the global top-k
    has fewer than k group rows ranked above it anywhere — hence it
    survives its own batch's cut — making the merged reservoir
    IDENTICAL to the offline batch draw over the full stream for ANY
    micro-batch split (the streaming_kmv_distinct argument, for
    weighted sampling instead of distinct counts). Runs to completion
    (availableNow) and returns the merged per-group reservoir."""
    from functools import reduce

    from ..operators.sampling import weighted_reservoir_per_group

    spark = stream_df.sparkSession
    parts: "list[DataFrame]" = []

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        r = weighted_reservoir_per_group(
            batch, group_cols, key_col, weight_col, k=k, salt=salt
        )
        parts.append(r.localCheckpoint(eager=True))

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    _await_and_record(q)
    if not parts:
        return spark.createDataFrame([], stream_df.schema)
    merged = reduce(lambda a, b: a.unionByName(b), parts)
    return weighted_reservoir_per_group(
        merged, group_cols, key_col, weight_col, k=k, salt=salt
    )
