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


def compact_parquet(
    spark, src_path: str, dst_path: str, target_file_mb: int = 256, mode: str = "overwrite"
) -> int:
    """Rewrite a parquet directory into files of ~``target_file_mb`` each.

    File-count sizing uses the TRUE on-disk byte size of the source (listed
    via Hadoop's FileSystem, so it works on any supported filesystem), not a
    row-size guess — compression ratios make schema-based estimates wrong
    by 5-10×. At 100 TB, both failure modes are operational incidents:
    thousands of KB-files per partition (listing + open overhead, tiny row
    groups) or single multi-GB files (no read parallelism). Streaming
    sinks and over-partitioned jobs produce the former; this is the
    periodic compaction pass that fixes them.

    Returns the number of output files written."""
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total_bytes = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    # repartition (round-robin) rather than coalesce: coalesce would chain
    # upstream and can collapse read parallelism; compaction is IO-bound
    # and wants an even spread
    df.repartition(n_files).write.mode(mode).parquet(dst_path)
    return n_files


def write_clustered(
    path: str,
    cluster_by: Sequence[str],
    num_files: int = 32,
    mode: str = "overwrite",
):
    """Range-clustered parquet layout: rows are range-partitioned on
    ``cluster_by`` and sorted within each file, so every file (and every
    row group inside it) covers a narrow, non-overlapping key range.

    The point at 100 TB: parquet readers prune files and row groups from
    footer min/max statistics, and those statistics only help when values
    are clustered — a range query over a randomly-laid-out table still
    touches every file, over a clustered one it touches the few files
    whose range overlaps (the single-dimension case of Z-ordering /
    liquid clustering). ``repartitionByRange`` samples key quantiles, so
    files come out balanced even under skew.
    """

    def sink(df: DataFrame):
        (
            df.repartitionByRange(num_files, *cluster_by)
            .sortWithinPartitions(*cluster_by)
            .write.mode(mode)
            .parquet(path)
        )
        return path

    return sink
