"""User-defined generator sources via the Spark 4 Python DataSource API.

The reference's ``Start`` node is an arbitrary user function pushing
values into the graph (`pipe/node.go:12-14`: emits "during an indefinite
amount of time"). The engine's faithful Spark-native analog is a custom
``DataSource``: the user supplies a plain Python generator and gets a
real DataFrame scan back — partition-parallel in batch, offset-tracked
and replayable in streaming — instead of driver-side
``createDataFrame`` materialization.

Scale notes:

* batch: the generator runs once per input partition ON THE EXECUTORS
  (``fn(partition_index)``); the driver never holds the data. A
  100-partition registration is 100 parallel generator tasks.
* streaming: micro-batches are defined by integer offsets and
  ``fn(start, end)`` must be deterministic for a given range — that is
  exactly Spark's replayable-source contract (checkpoint recovery
  re-reads a committed range), and it is the honest version of
  "indefinite source" at scale: an unreplayable push source cannot give
  end-to-end exactly-once.
"""

from __future__ import annotations

import uuid
from typing import Callable, Iterator, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def generator_source(
    spark: SparkSession,
    fn: Callable[[int], Iterator[tuple]],
    schema: str,
    num_partitions: int = 1,
) -> DataFrame:
    """Batch DataFrame from a user generator.

    ``fn(partition_index)`` is executed on an executor for each of the
    ``num_partitions`` input partitions and yields row tuples matching
    ``schema``. The callable is shipped by cloudpickle — closures are
    fine; captured state must be picklable.
    """

    class _Reader(DataSourceReader):
        def partitions(self) -> Sequence[InputPartition]:
            return [InputPartition(i) for i in range(num_partitions)]

        def read(self, partition: InputPartition):
            return fn(partition.value)

    class _GenSource(DataSource):
        _fmt = f"pipes_generator_{uuid.uuid4().hex[:12]}"

        @classmethod
        def name(cls) -> str:
            return cls._fmt

        def schema(self) -> str:
            return schema

        def reader(self, schema) -> DataSourceReader:
            return _Reader()

    spark.dataSource.register(_GenSource)
    return spark.read.format(_GenSource._fmt).load()


def stream_generator_source(
    spark: SparkSession,
    fn: Callable[[int, int], Iterator[tuple]],
    schema: str,
    rows_per_batch: int = 1000,
    max_offset: Optional[int] = None,
) -> DataFrame:
    """Streaming DataFrame from an offset-deterministic user generator.

    ``fn(start, end)`` yields the rows for offsets ``[start, end)`` and
    must be deterministic for a given range (the replayable-source
    contract — recovery re-reads committed ranges). Each micro-batch
    covers ``rows_per_batch`` offsets; ``max_offset`` caps the stream
    (after which batches are empty), letting tests drain it.
    """

    class _StreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"offset": 0}

        def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
            lo = start["offset"]
            hi = lo + rows_per_batch
            if max_offset is not None:
                hi = min(hi, max_offset)
                if lo >= max_offset:
                    # MUST be an iterator: on an exhausted stream (end ==
                    # start) pyspark's prefetch cache probes emptiness with
                    # next(it) — a plain list raises TypeError and kills the
                    # query (pyspark/sql/datasource_internal.py,
                    # add_result_to_cache)
                    return iter(()), {"offset": lo}
            # materialized then wrapped: the simple-reader protocol
            # prefetches driver-side and pickles the batch
            return iter(list(fn(lo, hi))), {"offset": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(list(fn(start["offset"], end["offset"])))

    class _GenStreamSource(DataSource):
        _fmt = f"pipes_stream_generator_{uuid.uuid4().hex[:12]}"

        @classmethod
        def name(cls) -> str:
            return cls._fmt

        def schema(self) -> str:
            return schema

        def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
            return _StreamReader()

    spark.dataSource.register(_GenStreamSource)
    return spark.readStream.format(_GenStreamSource._fmt).load()


def function_sink(
    df: DataFrame,
    fn: Callable[[Iterator[tuple]], object],
    mode: str = "append",
) -> None:
    """User-defined partition sink via the Spark 4 Python DataSource
    writer API — the executor-side analog of the reference's ``Final``
    node (an arbitrary user function consuming the stream,
    ref: pipe/node.go:21-23).

    ``fn(rows)`` runs ON AN EXECUTOR once per partition over that
    partition's row iterator (cloudpickle-shipped closure; e.g. POST a
    micro-batch to a service, write a side-format file). Contrast with
    ``sinks.collect_rows``: nothing funnels through the driver, so the
    sink scales with the partition count. Spark's task machinery gives
    the standard write contract — failed tasks rerun, so ``fn`` must be
    idempotent per partition content (the same contract every
    distributed writer has).
    """
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _Writer(DataSourceWriter):
        def write(self, rows) -> WriterCommitMessage:
            fn(rows)
            return WriterCommitMessage()

        def commit(self, messages) -> None:
            return None

        def abort(self, messages) -> None:
            return None

    class _FnSink(DataSource):
        _fmt = f"pipes_fn_sink_{uuid.uuid4().hex[:12]}"

        @classmethod
        def name(cls) -> str:
            return cls._fmt

        def writer(self, schema, overwrite):
            return _Writer()

    spark = df.sparkSession
    spark.dataSource.register(_FnSink)
    df.write.format(_FnSink._fmt).mode(mode).save()


def stream_function_sink(
    stream_df: DataFrame,
    fn: Callable[[int, Iterator[tuple]], object],
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming twin of :func:`function_sink` via the Spark 4
    ``DataSourceStreamWriter`` API — an arbitrary user function as the
    terminal node of a STREAMING graph (the reference's ``Final`` on an
    unbounded source, ref: pipe/node.go:21-23).

    ``fn(batch_id, rows)`` runs ON AN EXECUTOR once per partition of each
    micro-batch. Unlike ``foreachBatch`` (whole-batch DataFrame callback on
    the driver), this is the partition-parallel contract: nothing funnels
    through the driver, and Spark's streaming commit protocol invokes
    ``commit(messages, batchId)`` only after every partition of the batch
    succeeded — a failed batch is retried from the checkpoint, so ``fn``
    must be idempotent per (batch_id, partition content), the standard
    exactly-once-sink contract.

    Returns the started ``StreamingQuery`` (awaited already when
    ``available_now``).
    """
    from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage

    class _StreamWriter(DataSourceStreamWriter):
        def __init__(self):
            self._batch_id = None

        def write(self, rows) -> WriterCommitMessage:
            from pyspark import TaskContext

            # the streaming writer learns the batch id from the task's
            # epoch coordinator property; fall back to -1 if absent
            ctx = TaskContext.get()
            bid = int(ctx.getLocalProperty("streaming.sql.batchId") or -1)
            fn(bid, rows)
            return WriterCommitMessage()

        def commit(self, messages, batchId) -> None:
            return None

        def abort(self, messages, batchId) -> None:
            return None

    class _FnStreamSink(DataSource):
        _fmt = f"pipes_fn_stream_sink_{uuid.uuid4().hex[:12]}"

        @classmethod
        def name(cls) -> str:
            return cls._fmt

        def streamWriter(self, schema, overwrite):
            return _StreamWriter()

    spark = stream_df.sparkSession
    spark.dataSource.register(_FnStreamSink)
    writer = (
        stream_df.writeStream.format(_FnStreamSink._fmt)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
