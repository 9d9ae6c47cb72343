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


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot read
    natively (PARQUET_TYPE_ILLEGAL). Detected from the parquet footer."""
    try:
        import pyarrow.dataset as ds
        import pyarrow.types as pat

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str, columns: Optional[Sequence[str]] = None) -> DataFrame:
    """Parquet scan. Handles TIMESTAMP(NANOS) columns by reading them as
    nano-epoch longs (``spark.sql.legacy.parquet.nanosAsLong``) and
    converting to microsecond timestamps — lossless for µs-grain data and
    value-identical to DuckDB's read of the same file."""
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep timestamp semantics identical to the DuckDB oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in nano_cols:
        # integer division: ns epochs exceed 2^53, float division is lossy
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
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
