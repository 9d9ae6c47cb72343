"""Bucket-parallel global ordering primitives.

A ``Window.orderBy(...)`` with no partition is ONE task sorting the whole
stream — correct at any toy scale and a guaranteed straggler at 100 TB
(Spark logs "No Partition Defined for Window operation" for exactly this
reason). Every global-rank / global-cumsum consumer in this package routes
through the helpers here instead:

1. **Bucket monotonically by value.** ``approx_percentile`` boundaries of
   the order column are computed as a 1-row aggregate and cross-joined back
   broadcast (no driver action — construction stays lazy); each row's bucket
   id is the count of boundaries strictly below its value, unrolled as ONE
   flat codegen-able SQL expression (no higher-order ``aggregate`` — that is
   CodegenFallback and ~50× slower per element). Rows with EQUAL order
   values always land in the SAME bucket, so ties never straddle buckets
   and within-bucket order + bucket order composes to exactly the global
   order.
2. **Rank / cumsum within buckets** with ``Window.partitionBy(bucket)`` —
   parallelism = number of non-empty buckets.
3. **Stitch with the per-bucket offset table**: counts/sums per bucket are
   a ≤ ``n_buckets``-row aggregate; their cumulative offsets (a window over
   that tiny table — trivially single-task safe) broadcast-join back and
   shift the within-bucket numbers to the exact global values.

The composition is EQUAL to the single-partition form row-for-row (not an
approximation): the driver's DuckDB oracle hash-checks every consumer
against the global-sort SQL at sf0.01. ``n_buckets=1`` degenerates to the
single-partition shape — useful as the A/B baseline in scale probes.

Equal-frequency boundaries (rather than uniform min/max splits) keep the
buckets balanced under value skew; a pathological single hot VALUE still
collapses into one bucket, but that is forced by determinism (equal keys
must share a bucket) and matches the groupBy-shuffle behavior of every
other operator on the same key.

Scale analogy in the reference: no stage may serialize the whole stream
through one goroutine (ref: pipe/node.go:175-178) — these helpers are the
relational restatement of that rule.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_value_buckets",
    "bucketed_cumsum",
    "bucketed_cummax",
    "bucketed_lag",
    "bucketed_row_number",
    "bucketed_ntile",
]

_BNDS = "_rkb_bnds"
_BKT = "_rkb"

DEFAULT_BUCKETS = 32  # 128 compare terms ≈ 400 expr nodes — well inside
# the ~1k-node JIT limit (CLAUDE.md); raise per-call on a real cluster.


def with_value_buckets(
    df: DataFrame,
    order_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    accuracy: int = 10_000,
) -> DataFrame:
    """Add a bucket id column ``_rkb`` that is monotone non-decreasing in
    ``order_col`` (a numeric, non-null column) and deterministic per value.

    Boundaries are in-plan (1-row ``approx_percentile`` aggregate,
    cross-joined broadcast) so construction fires no Spark job; the bucket
    id is a flat unrolled sum of ``value > boundary_i`` casts (codegen, no
    interpreted higher-order function). Boundary precision is irrelevant to
    correctness — ANY monotone value-deterministic split yields the same
    stitched ranks — so the approx sketch's merge nondeterminism cannot
    leak into results.

    NULL handling: rows where ``order_col`` IS NULL are FILTERED OUT (in
    both the bucketed and the ``n_buckets<=1`` degenerate path). A NULL
    value has no position in a value-ordered sweep; before this filter a
    NULL row got a NULL bucket id, was silently dropped by the downstream
    equi-join, yet its contribution still leaked into every bucket's
    offset (NULL sorts first under ASC). Callers ranking a possibly-null
    column must pre-filter or pre-coalesce explicitly.
    """
    df = df.filter(F.col(order_col).isNotNull())
    if n_buckets <= 1:
        return df.withColumn(_BKT, F.lit(0))
    fracs = ", ".join(repr(i / n_buckets) for i in range(1, n_buckets))
    bnds = df.agg(
        F.expr(
            f"approx_percentile({order_col}, array({fracs}), {accuracy})"
        ).alias(_BNDS)
    )
    terms = " + ".join(
        f"CAST({order_col} > element_at({_BNDS}, {i}) AS INT)"
        for i in range(1, n_buckets)
    )
    from ..caching import scoped_persist

    # persisted (scope-released, CLAUDE.md contract): every caller reads
    # the bucketed frame at least twice (per-bucket totals + the stitched
    # main pass), and CHAINED calls (e.g. the three RFM ntiles) would
    # otherwise re-expand the whole upstream dag per reference —
    # exponentially: the un-persisted form planned ~780 AQE stages and
    # 3.8 MiB task binaries for three chained ntiles. persist() is lazy,
    # so construction still fires no Spark job.
    return scoped_persist(
        df.crossJoin(F.broadcast(bnds))
        .withColumn(_BKT, F.expr(terms))
        .drop(_BNDS)
    )


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    sums: Dict[str, Union[str, Column]],
    *,
    inclusive: bool = False,
    descending: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Global cumulative sums over rows ordered by ``order_col`` — the
    scale-safe replacement for ``F.sum(x).over(Window.orderBy(order_col))``.

    ``sums`` maps output column names to the summed input (name or Column).
    ``inclusive=False`` gives the strictly-preceding frame
    (``rowsBetween(unboundedPreceding, -1)``, first row = 0);
    ``inclusive=True`` includes the current row. ``descending`` orders the
    accumulation from the top value down (the threshold-sweep direction).

    CONTRACT: ``order_col`` values must be DISTINCT per row (the callers
    all cumsum over an already-grouped value domain) — with duplicates a
    row-order-dependent frame would be nondeterministic in the global form
    too. Rows with a NULL ``order_col`` are excluded (see
    :func:`with_value_buckets`); pre-filter/coalesce if they must count.
    """
    b = with_value_buckets(df, order_col, n_buckets)
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    upper = 0 if inclusive else -1
    w_in = (
        Window.partitionBy(_BKT)
        .orderBy(oc)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    cols = {k: (F.col(v) if isinstance(v, str) else v) for k, v in sums.items()}
    totals = b.groupBy(_BKT).agg(
        *[F.sum(c).alias(f"{k}__t") for k, c in cols.items()]
    )
    bc = F.col(_BKT).desc() if descending else F.col(_BKT).asc()
    # window over ≤ n_buckets rows — trivially single-task safe; the
    # constant partition key only suppresses Spark's no-partition warning
    # (same single tiny partition either way)
    w_off = Window.partitionBy(F.lit(0)).orderBy(bc).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        _BKT,
        *[
            F.coalesce(F.sum(f"{k}__t").over(w_off), F.lit(0)).alias(f"{k}__off")
            for k in cols
        ],
    )
    out = b.join(F.broadcast(offs), _BKT)
    for k, c in cols.items():
        out = out.withColumn(
            k,
            F.col(f"{k}__off")
            + F.coalesce(F.sum(c).over(w_in), F.lit(0)),
        )
    return out.drop(_BKT, *[f"{k}__off" for k in cols])


def bucketed_lag(
    df: DataFrame,
    order_col: str,
    lags: Dict[str, str],
    *,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Global ``lag(1)`` over rows ordered by ``order_col`` — the
    scale-safe replacement for ``F.lag(x).over(Window.orderBy(order_col))``.

    ``lags`` maps output column names to lagged source column names. The
    globally-first row gets NULL, exactly like the single-partition form.

    Shape: value-bucket, lag within each bucket in parallel, and hand each
    bucket's FIRST row the PREVIOUS bucket's last row via a ≤ ``n_buckets``
    per-bucket ``max_by`` aggregate whose own lag runs over that tiny
    table. Bucket-boundary rows are detected by within-bucket
    ``row_number == 1`` (not by the lag being NULL), so legitimately-NULL
    source values lag through exactly.

    CONTRACT: ``order_col`` values must be DISTINCT per row and non-null
    (NULL order rows are excluded — see :func:`with_value_buckets`).
    """
    b = with_value_buckets(df, order_col, n_buckets)
    w_in = Window.partitionBy(_BKT).orderBy(F.col(order_col).asc())
    # one row per non-empty bucket: that bucket's last row's lagged values
    last = b.groupBy(_BKT).agg(
        *[F.max_by(src, order_col).alias(f"{k}__pb") for k, src in lags.items()]
    )
    # ≤ n_buckets rows; constant partition key suppresses the no-partition
    # warning for this trivially-bounded stitch window. lag skips EMPTY
    # buckets naturally — only non-empty buckets have rows here.
    w_off = Window.partitionBy(F.lit(0)).orderBy(F.col(_BKT).asc())
    prev = last.select(
        _BKT,
        *[F.lag(f"{k}__pb").over(w_off).alias(f"{k}__pb") for k in lags],
    )
    out = b.join(F.broadcast(prev), _BKT)
    rn = F.row_number().over(w_in)
    for k, src in lags.items():
        out = out.withColumn(
            k,
            F.when(rn == 1, F.col(f"{k}__pb")).otherwise(
                F.lag(src).over(w_in)
            ),
        )
    return out.drop(_BKT, *[f"{k}__pb" for k in lags])


def bucketed_cummax(
    df: DataFrame,
    order_col: str,
    exts: Dict[str, Union[str, Column]],
    *,
    minimum: bool = False,
    inclusive: bool = True,
    descending: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Global running max (or min, with ``minimum=True``) over rows
    ordered by ``order_col`` — the scale-safe replacement for
    ``F.max(x).over(Window.orderBy(order_col))``.

    ``exts`` maps output column names to the tracked input (name or
    Column). Unlike the float-sum case, min/max are IDEMPOTENT and
    re-associate exactly, so the bucketed offset stitch is bit-identical
    to a sequential fold for every type. The per-bucket offset (the
    running extreme of all PRECEDING buckets' extremes) is NULL for the
    first bucket; ``greatest``/``least`` skip NULLs, so no sentinel is
    needed and legitimately-NULL inputs behave exactly like the global
    window (ignored until a non-null value appears).

    CONTRACT: ``order_col`` values must be DISTINCT per row and non-null
    (NULL order rows are excluded — see :func:`with_value_buckets`);
    rank first (``bucketed_row_number``) when a tiebreak is needed.
    """
    ext = F.min if minimum else F.max
    comb = F.least if minimum else F.greatest
    b = with_value_buckets(df, order_col, n_buckets)
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    upper = 0 if inclusive else -1
    w_in = (
        Window.partitionBy(_BKT)
        .orderBy(oc)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    cols = {k: (F.col(v) if isinstance(v, str) else v) for k, v in exts.items()}
    totals = b.groupBy(_BKT).agg(
        *[ext(c).alias(f"{k}__t") for k, c in cols.items()]
    )
    bc = F.col(_BKT).desc() if descending else F.col(_BKT).asc()
    # window over ≤ n_buckets rows — trivially single-task safe; the
    # constant partition key only suppresses Spark's no-partition warning
    w_off = Window.partitionBy(F.lit(0)).orderBy(bc).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        _BKT,
        *[ext(f"{k}__t").over(w_off).alias(f"{k}__off") for k in cols],
    )
    out = b.join(F.broadcast(offs), _BKT)
    for k, c in cols.items():
        out = out.withColumn(k, comb(F.col(f"{k}__off"), ext(c).over(w_in)))
    return out.drop(_BKT, *[f"{k}__off" for k in cols])


def bucketed_row_number(
    df: DataFrame,
    bucket_col: str,
    order_cols: Sequence[Column],
    out: str = "_rn",
    *,
    descending_bucket: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exact global ``row_number()`` over ``order_cols`` — the scale-safe
    replacement for ``F.row_number().over(Window.orderBy(...))``.

    ``bucket_col`` must be the FIRST order column's name (buckets are cut
    on its values; later order columns only break ties, and equal first-col
    values share a bucket, so bucket order + within-bucket order equals the
    global order). Set ``descending_bucket`` when that first column sorts
    descending. The full ``order_cols`` must be a total (deterministic)
    order, same as any reproducible global rank. Rows with a NULL
    ``bucket_col`` are excluded (see :func:`with_value_buckets`).
    """
    b = with_value_buckets(df, bucket_col, n_buckets)
    w_in = Window.partitionBy(_BKT).orderBy(*order_cols)
    counts = b.groupBy(_BKT).agg(F.count(F.lit(1)).alias("__c"))
    bc = F.col(_BKT).desc() if descending_bucket else F.col(_BKT).asc()
    # ≤ n_buckets rows; constant partition key suppresses the no-partition
    # warning for this trivially-bounded stitch window
    w_off = Window.partitionBy(F.lit(0)).orderBy(bc).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        _BKT,
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).cast("long").alias("__off"),
    )
    return (
        b.join(F.broadcast(offs), _BKT)
        .withColumn(out, (F.col("__off") + F.row_number().over(w_in)).cast("long"))
        .drop(_BKT, "__off")
    )


def bucketed_ntile(
    df: DataFrame,
    bucket_col: str,
    order_cols: Sequence[Column],
    n_bins: int,
    out: str,
    *,
    descending_bucket: bool = False,
    n_buckets: int = DEFAULT_BUCKETS,
    total: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact global ``ntile(n_bins)`` over ``order_cols`` without the
    single-partition sort: global rank via :func:`bucketed_row_number`,
    then the closed-form tile assignment (the first ``n mod k`` tiles get
    one extra row — SQL-standard, identical in Spark and DuckDB):

        q, rem = n div k, n mod k
        tile(r) = ceil(r / (q+1))                     if r ≤ (q+1)·rem
                = rem + ceil((r − (q+1)·rem) / q)     otherwise

    ``n`` stays IN-PLAN (1-row count cross-joined broadcast; pass ``total``
    to reuse a caller's existing 1-row frame — it must count the NON-NULL
    ``bucket_col`` domain, same as the default, since NULL rows hold no
    rank). All arithmetic is integer
    (ceil(a/b) = (a+b−1) div b), branch-guarded so the q=0 division is
    never evaluated (ANSI-safe: when q=0, every rank satisfies the first
    branch).
    """
    ranked = bucketed_row_number(
        df,
        bucket_col,
        order_cols,
        "__r",
        descending_bucket=descending_bucket,
        n_buckets=n_buckets,
    )
    tot = total if total is not None else df.filter(
        F.col(bucket_col).isNotNull()
    ).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    r = F.col("__r")
    q = F.floor(F.col("__n") / n_bins).cast("long")
    rem = (F.col("__n") % n_bins).cast("long")
    big = (q + 1) * rem  # rows living in the (q+1)-sized leading tiles
    tile = F.when(
        r <= big, F.floor((r + q) / (q + 1))
    ).otherwise(rem + F.floor((r - big + q - 1) / q))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(out, tile.cast("long"))
        .drop("__r", "__n")
    )
