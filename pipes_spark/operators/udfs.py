"""UDF surface (SURVEY.md §2.C "UDF surface") — the engine's general escape
hatch, the analog of an arbitrary ``MiddleFunc`` body (ref: pipe/node.go:19).

Preference order at scale (each tier ~10× the serialization cost of the one
above):

1. built-in column expressions (everything else in this package) — JVM
   codegen, zero Python;
2. ``@pandas_udf`` / ``mapInPandas`` / ``applyInPandas`` — Arrow-batched
   vectorized Python (used here);
3. row-at-a-time ``F.udf`` / ``@udtf`` — last resort, provided for parity.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import _ship_package


def vectorized_score(df: DataFrame, value_col: str = "value", out_col: str = "score") -> DataFrame:
    """Arrow-vectorized scalar Pandas UDF: tanh-squashed score. One Python
    round-trip per Arrow batch (~10k rows), not per row."""
    _ship_package(df.sparkSession)

    @F.pandas_udf("double")
    def score(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.round(np.tanh(v / 10.0), 6))

    return df.withColumn(out_col, score(F.col(value_col)))


def grouped_zscore(
    df: DataFrame,
    group_col: str = "user_id",
    value_col: str = "value",
    n_buckets: int = 0,
) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score normalization — the
    canonical 'arbitrary per-key state' shape, in its BUCKET-PARALLEL form:
    the applyInPandas key is a hash BUCKET of the group key (default: one
    bucket per shuffle partition), and the per-group math runs vectorized
    via ``pandas.groupby(...).transform`` inside each Arrow batch. Same
    results bit-for-bit as grouping by the raw key (verified in pytest),
    but one Python call per bucket instead of one per group — A/B'd at
    sf0.1 (fresh-process medians, back-to-back): raw per-user keys 3.2-4.7 s
    vs 0.5 s bucketed (~6×; 1 500 groups × per-call overhead was the whole
    cost). Scale contract: a BUCKET must fit in executor memory — with
    buckets = shuffle partitions that is the contract every shuffle already
    has, and hash bucketing keeps them balanced under group-key skew."""
    _ship_package(df.sparkSession)
    if n_buckets <= 0:
        try:
            n_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            # AQE-managed deployments may hold a non-numeric value ("auto")
            n_buckets = 32
    out_schema = f"{group_col} bigint, event_id bigint, {value_col} double, zscore double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(group_col)[value_col]
        sd = g.transform("std")  # ddof=1: matches stddev_samp
        z = ((pdf[value_col] - g.transform("mean")) / sd).where(sd > 0)
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "event_id": pdf["event_id"],
                value_col: pdf[value_col],
                "zscore": z.fillna(0.0).round(6),
            }
        )

    return (
        df.select(group_col, "event_id", value_col)
        .withColumn("zb", F.pmod(F.xxhash64(group_col), F.lit(n_buckets)))
        .groupBy("zb")
        .applyInPandas(normalize, schema=out_schema)
    )


def explode_tokens_udtf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Python UDTF (table function): one output row per token with its
    position — the 1→N row-generator shape (row-at-a-time; prefer the
    built-in explode unless per-row logic is genuinely opaque)."""
    from pyspark.sql.functions import udtf

    _ship_package(df.sparkSession)

    @udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            pos = 0
            for tok in text.split():
                if tok:
                    yield doc_id, pos, tok
                    pos += 1

    df.sparkSession.udtf.register("pipes_tokenize", Tokenize)
    view = f"_udtf_in_{abs(hash((id_col, text_col))) % 10**8}"
    df.select(F.col(id_col), F.col(text_col)).createOrReplaceTempView(view)
    return df.sparkSession.sql(
        f"SELECT t.* FROM {view}, LATERAL pipes_tokenize({id_col}, {text_col}) t"
    )


def row_udf_demo(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Row-at-a-time Python UDF — parity-only; see module docstring for why
    this tier is last."""
    _ship_package(df.sparkSession)
    fmt = F.udf(lambda v: f"v={v:.2f}", "string")
    return df.withColumn("formatted", fmt(F.col(value_col)))


def grouped_agg_harmonic_mean(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Custom AGGREGATE via the grouped-agg Pandas UDF surface (the
    series→scalar tier of the UDF ladder — a true UDAF: Spark splits the
    group across Arrow batches and the UDF reduces each, so it composes
    with groupBy exactly like a built-in). Harmonic mean per group —
    the correct average for rates — as the demonstrator.

    The same quantity is expressible as n/Σ(1/x) in pure SQL (and that
    is what the oracle does); the point here is the API surface, kept
    numerically aligned by rounding reciprocals to 6 decimals before
    summation on both sides. NULLs and zeros are excluded (a zero rate
    has no harmonic mean)."""
    _ship_package(df.sparkSession)

    @F.pandas_udf("double")
    def hmean(v: pd.Series) -> float:
        import numpy as np

        x = v.to_numpy(dtype="float64")
        x = x[(x == x) & (x != 0.0)]
        if len(x) == 0:
            return None
        return float(len(x) / np.round(1.0 / x, 6).sum())

    out = df.filter(
        F.col(value_col).isNotNull() & (F.col(value_col) != 0)
    ).groupBy(group_col)
    return out.agg(F.round(hmean(F.col(value_col)), 6).alias("harmonic_mean"))


def arrow_batch_normalize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """``mapInArrow`` demonstrator — the lowest-overhead Python tier:
    the UDF receives raw ``pyarrow.RecordBatch``es (no pandas
    conversion at all) and yields batches back. Computes each vector's
    L2 norm and its unit-normalized form with one numpy pass per batch.

    At 100 TB this tier matters when the per-batch work is a single
    vectorized kernel and even the Arrow→pandas conversion of
    mapInPandas is measurable overhead."""
    _ship_package(df.sparkSession)

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            tbl = batch.to_pydict()
            ids = tbl[id_col]
            vecs = [np.asarray(v, dtype="float64") for v in tbl[vec_col]]
            norms = [float(np.linalg.norm(v)) for v in vecs]
            units = [
                [float(x) for x in (v / n if n > 0 else v)]
                for v, n in zip(vecs, norms)
            ]
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: ids,
                    "l2_norm": [round(n, 6) for n in norms],
                    "unit": units,
                }
            )

    return df.select(id_col, vec_col).mapInArrow(
        gen, schema=f"{id_col} bigint, l2_norm double, unit array<double>"
    )


def dynamic_unpivot_udtf(df: DataFrame, cols, id_col: str = "doc_id") -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze`` static method): the
    output schema is decided at PLAN time from the input's actual type —
    the value column adopts the fields' common type when they share one
    (numeric measures stay numeric) and falls back to string otherwise.
    A fixed-``returnType`` UDTF (``explode_tokens_udtf``) cannot do
    this; ``analyze`` is what makes a table function generic over
    schemas, the way built-in ``unpivot``/``explode`` are.

    Emits (id, column, value) — one row per listed column per input row.
    Row-at-a-time tier: prefer the built-in unpivot unless the per-row
    logic is genuinely opaque; declared for API-surface parity.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    _ship_package(df.sparkSession)

    @udtf
    class UnpivotAny:
        @staticmethod
        def analyze(id_arg, row_arg) -> AnalyzeResult:
            ftypes = {f.dataType for f in row_arg.dataType.fields}
            vt = ftypes.pop() if len(ftypes) == 1 else StringType()
            st = (
                StructType()
                .add("id", id_arg.dataType)
                .add("column", StringType())
                .add("value", vt)
            )
            return AnalyzeResult(schema=st)

        def eval(self, id_val, row):
            d = row.asDict()
            for k in sorted(d):
                yield id_val, k, d[k]

    df.sparkSession.udtf.register("pipes_unpivot_any", UnpivotAny)
    cols = list(cols)
    # uuid-suffixed so concurrent/subsequent calls never share a view
    # (the run_to_memory naming pattern)
    import uuid

    view = f"_udtf_up_{uuid.uuid4().hex[:12]}"
    df.select(F.col(id_col), *[F.col(c) for c in cols]).createOrReplaceTempView(view)
    struct_args = ", ".join(cols)
    out = df.sparkSession.sql(
        f"SELECT t.* FROM {view}, "
        f"LATERAL pipes_unpivot_any({id_col}, struct({struct_args})) t"
    )
    # classic-mode sql() analyzes eagerly, so the resolved plan no longer
    # needs the view — drop it to avoid per-call catalog leaks
    df.sparkSession.catalog.dropTempView(view)
    return out


def grouped_minmax_arrow(
    df: DataFrame, group_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Grouped-map **applyInArrow**: per-group min-max scaling computed
    entirely in pyarrow.compute — the zero-copy tier of the grouped-map
    family (no Arrow→pandas materialization at all, unlike
    :func:`grouped_zscore`). Same scale contract: one shuffle on the group
    key, each group must fit in executor memory. ``scaled`` is returned
    raw; callers round in-plan so both engines share one rounding rule."""
    import pyarrow as pa
    import pyarrow.compute as pc

    _ship_package(df.sparkSession)
    out_schema = (
        f"{group_col} bigint, event_id bigint, {value_col} double, scaled double"
    )

    def scale(table: "pa.Table") -> "pa.Table":
        v = table.column(value_col)
        mm = pc.min_max(v)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or hi is None:
            # all-NULL group: the SQL window twin's CASE sees NULL = NULL
            # as unknown and yields NULL — match it, don't invent 0.0
            scaled = pa.array([None] * len(table), type=pa.float64())
        elif hi == lo:
            scaled = pa.array([0.0] * len(table), type=pa.float64())
        else:
            scaled = pc.divide(
                pc.subtract(v.cast(pa.float64()), lo), float(hi - lo)
            )
        return pa.table(
            {
                group_col: table.column(group_col),
                "event_id": table.column("event_id"),
                value_col: v,
                "scaled": scaled,
            }
        )

    return (
        df.select(group_col, "event_id", value_col)
        .groupBy(group_col)
        .applyInArrow(scale, schema=out_schema)
    )
