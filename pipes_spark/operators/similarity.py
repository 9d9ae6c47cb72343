"""Similarity search over embedding columns (SURVEY.md §2.C extensions).

Two tiers, as a 100 TB pipeline needs both:

* ``cosine_topk`` — exact brute force. O(Q·N) dot products, but expressed as
  a broadcast join + codegen'd array arithmetic, so it is the right tool
  whenever the *query* set is small (evaluation, probing) even if the corpus
  is huge.
* ``lsh_cosine_topk`` — random-hyperplane LSH: bucket by sign-pattern, exact
  rerank within buckets. One shuffle on the bucket key; recall is tunable
  via ``num_planes``/multi-probe. The scale path for corpus×corpus search.

All vector math uses built-in higher-order functions (zip_with/aggregate) on
``array<float>`` columns — JVM-side, no Python serialization. A Pandas-UDF
BLAS variant is a drop-in alternative when vectors are wide (>1k dims);
for 64-dim embeddings the codegen path wins on serialization cost alone.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be broadcastable (the usual case: a probe/eval set).
    Results are deterministic: ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = (
        c.join(F.broadcast(q), F.col(query_id_col) != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(
                    F.transform("_qvec", lambda x: x.cast("double")),
                    F.transform("_cvec", lambda x: x.cast("double")),
                )
                / (
                    l2_norm(F.transform("_qvec", lambda x: x.cast("double")))
                    * l2_norm(F.transform("_cvec", lambda x: x.cast("double")))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _random_hyperplanes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def lsh_bucket(vec_col, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-pattern bucket id from deterministic random hyperplanes."""
    bucket = F.lit(0).cast("bigint")
    v = F.transform(vec_col if not isinstance(vec_col, str) else F.col(vec_col),
                    lambda x: x.cast("double"))
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) >= 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bucket + bit
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 6,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH + exact rerank.

    ``num_tables`` independent hash tables of ``num_planes`` sign bits each:
    a candidate is any corpus vector sharing a bucket with the query in ≥1
    table (collision prob per table = (1-θ/π)^planes, union over tables).
    More tables → higher recall, more shuffle volume; the standard knob.

    Scale: one shuffle keyed by (table, bucket); rerank is per-bucket exact
    cosine; no broadcast required on either side.
    """
    tables = [
        _random_hyperplanes(num_planes, dim, seed + 1000 * t) for t in range(num_tables)
    ]

    def with_buckets(df, idc, vecc, id_alias, vec_alias):
        buckets = F.array(
            *[lsh_bucket(F.col(vecc), tables[t]) for t in range(num_tables)]
        )
        return df.select(
            F.col(idc).alias(id_alias),
            F.col(vecc).alias(vec_alias),
            F.posexplode(buckets).alias("table", "bucket"),
        )

    c = with_buckets(corpus, id_col, vec_col, "neighbor_id", "_cvec")
    q = with_buckets(queries, id_col, vec_col, query_id_col, "_qvec")
    scored = (
        c.join(q, ["table", "bucket"])
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .dropDuplicates([query_id_col, "neighbor_id"])
        .withColumn(
            "cosine",
            F.round(
                dot(
                    F.transform("_qvec", lambda x: x.cast("double")),
                    F.transform("_cvec", lambda x: x.cast("double")),
                )
                / (
                    l2_norm(F.transform("_qvec", lambda x: x.cast("double")))
                    * l2_norm(F.transform("_cvec", lambda x: x.cast("double")))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (corpus self-similarity).

    Exact all-pairs formulation for oracle-checkable correctness; the scale
    path reuses the LSH bucketing to restrict pair generation."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    va = F.transform("_va", lambda x: x.cast("double"))
    vb = F.transform("_vb", lambda x: x.cast("double"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot(va, vb) / (l2_norm(va) * l2_norm(vb)), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
