"""Sources: scan/read operators (SURVEY.md §2.C "scans / sources").

The reference's sources are user Go functions pushing into a channel
(ref: pipe/node.go:12-14); here they are thin, named wrappers over Spark
readers so Catalyst gets pushdown/pruning for free, plus generators matching
the reference's test sources (``Counter``, literal sequences —
ref: pipe/node_test.go:383-389, pipe/bypass_test.go:38-42).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP.

    The driver's parquet stores ``timestamp[us]`` with
    ``isAdjustedToUTC=false``, which Spark 4 infers as TIMESTAMP_NTZ —
    a type `unix_millis`/`unix_micros`/`withWatermark` all reject. Under
    the engine's pinned UTC session zone the cast is value-identical to
    DuckDB's naive read of the same file, so oracles stay portable."""
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        # The cast interprets NTZ wall-clock in the session zone AT
        # EXECUTION TIME (the plan is lazy), so the UTC pin must be
        # permanent — a set/restore scope around this call would restore
        # the old zone before any action runs and silently change the
        # values. Deliberate session-wide side effect, documented in
        # CLAUDE.md/README; the engine's own session factory already pins
        # UTC, this covers driver-owned sessions.
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def read_parquet(spark: SparkSession, path: str, columns: Optional[Sequence[str]] = None) -> DataFrame:
    """Parquet scan; TIMESTAMP_NTZ columns normalized to TIMESTAMP (see
    :func:`normalize_ntz`). The cast is a zero-cost projection — pushdown
    and pruning on other columns are unaffected."""
    df = normalize_ntz(spark.read.parquet(path))
    if columns:
        df = df.select(*columns)
    return df


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True, **options) -> DataFrame:
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text(spark: SparkSession, paths, with_file_name: bool = True) -> DataFrame:
    """Text-file scan: one row per line. With ``with_file_name`` the result
    matches the reference's ``FileLine{FileName, Line}`` shape
    (ref: tutorial/minigrep/minigrep.go:13-20,65-85)."""
    df = spark.read.text(paths)
    if with_file_name:
        df = df.select(F.input_file_name().alias("file_name"), F.col("value").alias("line"))
    return df


def from_rows(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """In-memory literal source (ref: pipe/bypass_test.go:38-42)."""
    return spark.createDataFrame(list(rows), schema)


def counter(spark: SparkSession, from_: int, to: int, column: str = "n") -> DataFrame:
    """Emit integers from..to inclusive (ref: Counter, pipe/node_test.go:383-389)."""
    return spark.range(from_, to + 1).withColumnRenamed("id", column)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver's synthetic tables (TESTDATA.md)."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: Optional[Sequence[str]] = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: Optional[Sequence[str]] = None) -> None:
    """Register the synthetic tables as temp views for the SQL API."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


# user-defined generator sources (Spark 4 Python DataSource API — the
# Start-node analog for arbitrary user generators, pipe/node.go:12-14)
from pipes_spark.sources.generator import (  # noqa: E402,F401
    generator_source,
    stream_generator_source,
)
