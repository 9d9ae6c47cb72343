"""Sinks (SURVEY.md §2.C "sinks"): terminal operators for the Final node
position (ref: pipe/node.go:21-23). Thin, named wrappers so pipelines read
declaratively; each returns what the underlying action returns.

Scale notes: ``write_parquet`` supports partitioning columns (directory
pruning for downstream readers) and a target file-count hint — at 100 TB the
difference between 200 and 200k output files is an operational incident.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame


def write_parquet(
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
    target_files: Optional[int] = None,
):
    def sink(df: DataFrame):
        d = df.coalesce(target_files) if target_files else df
        w = d.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return path

    return sink


def write_csv(path: str, mode: str = "overwrite", header: bool = True, **options):
    def sink(df: DataFrame):
        df.write.mode(mode).options(header=header, **options).csv(path)
        return path

    return sink


def write_json(path: str, mode: str = "overwrite", **options):
    def sink(df: DataFrame):
        df.write.mode(mode).options(**options).json(path)
        return path

    return sink


def write_orc(path: str, mode: str = "overwrite"):
    def sink(df: DataFrame):
        df.write.mode(mode).orc(path)
        return path

    return sink


def collect_rows(df: DataFrame) -> list:
    """In-memory collect sink (ref: pipe/node_test.go:56-61)."""
    return df.collect()


def count_rows(df: DataFrame) -> int:
    return df.count()


def show(n: int = 20):
    """Console sink (ref: Printer, tutorial/minigrep/minigrep.go:108-115)."""

    def sink(df: DataFrame):
        df.show(n, truncate=False)

    return sink


def foreach_batch_stream(handler, output_mode: str = "append", **trigger: Any):
    """Streaming sink via foreachBatch (exactly-once per epoch handler)."""

    def sink(df: DataFrame):
        return (
            df.writeStream.foreachBatch(handler)
            .outputMode(output_mode)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )

    return sink


def write_bucketed(
    table_name: str,
    bucket_cols: list,
    num_buckets: int = 32,
    sort_cols: list = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
):
    """Bucketed managed-table sink: co-locates rows by hash(bucket_cols)
    at WRITE time, so later equi-joins and aggregations on those columns
    run exchange-free — the shuffle is paid once instead of per query.
    The standard layout for repeatedly-joined 100 TB fact tables.
    Returns a sink fn for Pipeline.add_final (or call directly)."""

    def sink(df):
        w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.saveAsTable(table_name)
        return table_name

    return sink
