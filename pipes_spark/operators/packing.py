"""Sequence packing for training-data pipelines: assemble documents into
fixed token-budget training sequences (SURVEY.md §2.C extensions; no
reference counterpart — a pipes user would write this as a stateful
MiddleFunc, ref: pipe/node.go:16-19).

Greedy packing is inherently sequential, so the distributed shape is
two-level: documents are hash-assigned to ``num_buckets`` independent
buckets (one shuffle), and first-fit-decreasing runs per bucket inside an
Arrow-batched ``applyInPandas``. Buckets are sized by count, not byte
volume, so skew is bounded by the hash; packing quality loss vs a global
greedy pass is negligible when buckets hold ≫ budget/avg_weight documents
(each bucket wastes at most one partially-filled sequence per bin opened).
At 100 TB this is the standard layout: the shuffle carries (id, weight)
longs only — never the document payload, which is joined back by id after
packing.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id long, weight long, bucket int, seq_id long, seq_pos int, seq_fill long"
)


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    budget: int = 2048,
    num_buckets: int = 0,
) -> DataFrame:
    """First-fit-decreasing sequence packing: every document is assigned to
    exactly one sequence; no sequence exceeds ``budget`` unless a single
    document alone does (it then sits in its own sequence).

    Returns (doc_id, weight, bucket, seq_id, seq_pos, seq_fill): ``seq_id``
    is globally unique (bucket in the high bits), ``seq_pos`` the insertion
    rank within the sequence, ``seq_fill`` the final token fill of the
    sequence the document landed in. Deterministic: packing order is
    (weight desc, id asc) within a bucket, and bucket assignment is
    ``xxhash64(id)``.
    """
    if num_buckets <= 0:
        num_buckets = df.sparkSession.sparkContext.defaultParallelism
    budget = int(budget)

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["weight", "doc_id"], ascending=[False, True])
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        fills: list[int] = []  # current fill per open sequence
        counts: list[int] = []  # items per open sequence
        seq_idx, seq_pos = [], []
        for w in pdf["weight"].to_numpy():
            w = int(w)
            for i, fill in enumerate(fills):
                if fill + w <= budget:
                    seq_idx.append(i)
                    seq_pos.append(counts[i])
                    fills[i] += w
                    counts[i] += 1
                    break
            else:
                seq_idx.append(len(fills))
                seq_pos.append(0)
                fills.append(w)
                counts.append(1)
        base = bucket << 32
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "weight": pdf["weight"].to_numpy(),
                "bucket": bucket,
                "seq_id": [base + i for i in seq_idx],
                "seq_pos": seq_pos,
                "seq_fill": [fills[i] for i in seq_idx],
            }
        )

    keyed = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(weight_col).cast("long").alias("weight"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).cast("int").alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandas(pack, _OUT_SCHEMA)


def padding_report(
    df: DataFrame,
    length_col: str,
    bucket_width: int = 64,
) -> DataFrame:
    """Length-bucketed padding-waste report: group sequences into fixed
    ``bucket_width`` length buckets and report how many pad positions a
    batch-to-bucket-max strategy would burn — the readout that decides a
    training pipeline's bucketing granularity (padding is pure wasted
    FLOPs; the report shows where the length distribution actually puts
    it).

    Per bucket: row count, max length, total real positions, padding =
    n·max − total, and the padded fraction. One map-side bucket
    expression + one count/sum/max aggregate — no shuffle beyond the
    groupBy, integer math throughout (the fraction is the only division,
    rounded identically everywhere).
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    ln = F.col(length_col).cast("long")
    b = F.floor(ln / F.lit(bucket_width)).cast("bigint")
    return (
        df.select(ln.alias("_l"), b.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max("_l").cast("bigint").alias("max_len"),
            F.sum("_l").cast("bigint").alias("total_len"),
        )
        .withColumn(
            "padding", F.col("n_rows") * F.col("max_len") - F.col("total_len")
        )
        .withColumn(
            "pad_frac",
            F.round(
                F.col("padding") / F.nullif(F.col("n_rows") * F.col("max_len"), F.lit(0)),
                6,
            ),
        )
    )
