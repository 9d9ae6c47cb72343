"""Feature-engineering operators for training-data pipelines: the
transforms that turn curated rows into model inputs, designed (like the
rest of the library) to be exact, engine-portable, and one-shuffle.

* leave-one-out target encoding — the high-cardinality-categorical
  workhorse, with the own-row exclusion that prevents target leakage;
* the hashing trick — fixed-width sparse features from unbounded token
  vocabularies with no dictionary to build, ship, or keep consistent.

Both use the same portable-hash / DECIMAL-sum determinism contracts as
operators.sampling / operators.profiling, so they are DuckDB-oracle
checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .text import tokens


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is replaced by
    the mean of the TARGET over the other rows of that category —
    ``(Σ_group − own) / (n_group − 1)`` — the standard high-cardinality
    categorical encoding, with the own-row exclusion that keeps the
    feature from leaking its own label (plain mean encoding memorizes
    singleton categories perfectly). Categories with one row encode
    NULL (no peers — the caller imputes a global prior downstream).

    One groupBy producing (n, Σ) per category as DECIMAL(28,6) —
    map-side combined, exact, order-independent — broadcast back onto
    the rows; the per-row arithmetic is codegen'd and rounded at 6, so
    the encoding is engine-portable.
    """
    stats = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(target_col).cast("decimal(28,6)")).alias("_s"),
    )
    loo = (
        (F.col("_s").cast("double") - F.col(target_col))
        / F.nullif(F.col("_n") - 1, F.lit(0))
    )
    return (
        df.join(F.broadcast(stats), cat_col)
        .withColumn(out_col, F.round(loo, 6))
        .drop("_n", "_s")
    )


def feature_hash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_features: int = 64,
    salt: str = "fh",
) -> DataFrame:
    """The hashing trick (Weinberger 2009): tokens map to a fixed
    ``num_features``-wide space by hash, producing sparse (id, bucket,
    count) features with NO vocabulary to build or synchronize — the
    property that matters at corpus scale, where a dictionary is a
    second distributed artifact that drifts.

    Buckets derive from the portable md5 hash (same primitive as the
    sampling family), so the exact same features come out of any
    engine, partitioning, or rerun — and the oracle can recompute them.
    Shape: explode tokens map-side, one (id, bucket) count aggregate —
    a single shuffle whose payload is two ints per token occurrence.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_t")
    )
    bucket = F.pmod(hash_bucket(F.col("_t"), salt), F.lit(num_features))
    return (
        tok.withColumn("bucket", bucket.cast("bigint"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
    )
