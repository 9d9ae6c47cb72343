"""Deterministic, engine-portable sampling (training-data pipeline surface).

Spark's native ``df.sample``/``sampleBy`` draw from a seeded RNG over the
partition iteration order — results change when partitioning changes, which
at 100 TB means every repartition silently reshuffles your holdout split.
These operators instead derive the sampling decision from a **hash of the
row's key**: stable across runs, partitionings, engines, and scale-ups, and
therefore safe for train/test splits that must never leak across pipeline
re-runs. (Same content-addressed idea as the MinHash dedup family —
ref framework analog: a sampling MiddleFunc would hash inside user code,
pipe/node.go:19.)

Hash: first 8 hex chars of md5(key) → uniform 32-bit integer. md5 is
available and bit-identical in Spark, DuckDB, and virtually every engine, so
every sampled query here is DuckDB-oracle-checkable. Keys are cast to
string first; keep keys integral or string (float formatting differs across
engines).

Scale: the hash is a per-row narrow expression (whole-stage codegen, no
shuffle, no UDF); sampling pushes ahead of wide operators so downstream
work sees only the sampled fraction.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32  # md5's first 8 hex chars span [0, 2^32)


def hash_bucket(key: Union[str, Column], salt: str = "") -> Column:
    """Uniform [0, 2^32) bucket from md5 of the key (+ optional salt —
    distinct salts give independent samples from the same keys)."""
    col = F.col(key) if isinstance(key, str) else key
    salted = F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")


def hash_bucket_sql(key_expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket` for oracle SQL."""
    salted = f"concat(CAST({key_expr} AS VARCHAR), '{salt}')" if salt else f"CAST({key_expr} AS VARCHAR)"
    return f"CAST(concat('0x', substr(md5({salted}), 1, 8)) AS BIGINT)"


def deterministic_sample(
    df: DataFrame, key: Union[str, Column], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the bucket space.

    The same (key, salt) is kept or dropped identically everywhere — across
    partitionings, retries, engines, and scale factors (a row sampled at
    sf0.01 is sampled at sf100 if it exists there)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(key, salt) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    fractions: Mapping[str, float],
    key: Union[str, Column],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible ``sampleBy``).

    ``fractions`` maps the string form of the stratum value (concatenated
    with '|' for multi-column strata) to its keep-fraction. Rebalancing
    long-tail strata (e.g. languages in a web corpus) without destabilizing
    the sample on re-runs is the 100 TB use case."""
    stratum = F.concat_ws("|", *[F.col(c).cast("string") for c in strata])
    thr = F.lit(int(default_fraction * _BUCKETS))
    expr = None
    for value, frac in fractions.items():
        cond = stratum == value
        branch = F.lit(int(frac * _BUCKETS))
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.filter(hash_bucket(key, salt) < thr)


def train_test_split(
    df: DataFrame, key: Union[str, Column], test_fraction: float, salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column ('train' | 'test') keyed on the row hash.

    Membership is a pure function of (key, salt): growing the corpus never
    moves an existing row across the split boundary — the property that
    prevents train/test leakage between pipeline versions."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    is_test = hash_bucket(key, salt) < int(test_fraction * _BUCKETS)
    return df.withColumn("split", F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: Mapping[str, float],
    key: Union[str, Column],
    salt: str = "",
) -> DataFrame:
    """Resample to a target group mixture by pure downsampling (the
    source-rebalancing step of corpus assembly — e.g. re-weight web vs
    books vs code to the training recipe's proportions).

    Given target weights ``w_g``, the largest mixture reachable without
    upsampling has output size ``N = min_g(count_g / p_g)`` where
    ``p_g = w_g / Σw``; each group then keeps ``N·p_g / count_g`` of its
    rows, decided by the portable md5 hash of ``key`` — deterministic
    across runs, partitionings, and engines. Groups without a weight are
    dropped.

    Scale: one tiny per-group count aggregation (map-side combined)
    broadcast back onto the stream; the keep decision is a narrow
    codegen'd filter — no shuffle of the data itself.
    """
    total_w = float(sum(weights.values()))
    p_expr = None
    for g, w in weights.items():
        p = float(w) / total_w
        cond = F.col(group_col) == g
        p_expr = F.when(cond, F.lit(p)) if p_expr is None else p_expr.when(cond, F.lit(p))
    counts = (
        df.filter(F.col(group_col).isin(*weights))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_p", p_expr)
    )
    from pyspark.sql import Window

    n_out = F.min(F.col("_cnt") / F.col("_p")).over(
        Window.partitionBy()
    )
    frac = F.least(F.lit(1.0), n_out * F.col("_p") / F.col("_cnt"))
    thresholds = counts.select(
        group_col, F.floor(frac * F.lit(float(_BUCKETS))).alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(hash_bucket(key, salt) < F.col("_thr"))
        .drop("_thr")
    )


def weighted_sample(
    df: DataFrame,
    key: Union[str, Column],
    weight: Union[str, Column],
    salt: str = "",
) -> DataFrame:
    """Per-row weighted Bernoulli keep: row survives iff
    ``hash(key) < clamp(weight, 0, 1) · 2³²`` — quality-scored downsampling
    (keep high-quality documents with probability ∝ score, the
    soft-filtering alternative to a hard threshold).

    Same portability contract as :func:`deterministic_sample`: the decision
    depends only on (key, salt, weight), so it is identical across runs,
    partitionings, engines, and scale factors. Map-side codegen filter —
    no shuffle, no RNG state.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
    return df.filter(
        hash_bucket(key, salt) < F.floor(clamped * F.lit(float(_BUCKETS)))
    )


def weighted_sample_sql(key_expr: str, weight_expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`weighted_sample`'s keep predicate."""
    return (
        f"{hash_bucket_sql(key_expr, salt)} < "
        f"floor(least(1.0, greatest(0.0, CAST({weight_expr} AS DOUBLE))) * {float(_BUCKETS)!r})"
    )


def reservoir_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Union[str, Column],
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by portable hash order
    — the deterministic analog of per-group reservoir sampling (uniform
    over the group, identical across runs/partitionings/engines; a
    different ``salt`` draws an independent sample).

    One shuffle on the group key; the rank window sorts (hash, key) so ties
    are impossible with unique keys. For heavily skewed groups at 100 TB,
    pre-filter with :func:`deterministic_sample` at a safe multiple of
    k/|group| first so no single task sorts a giant group."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket(key, salt), F.col(key) if isinstance(key, str) else key
    )
    return (
        df.withColumn("_rs", F.row_number().over(w))
        .filter(F.col("_rs") <= k)
        .drop("_rs")
    )


def kfold_assign(
    df: DataFrame, key: Union[str, Column], k: int, salt: str = ""
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = hash(key) mod k`` from the
    portable md5 hash — folds are disjoint, jointly exhaustive, stable
    across runs/partitionings/engines/scale factors, and independent per
    ``salt`` (re-salting redraws the folds). Map-side only; a fold's
    train split is ``fold != i``, no materialization per fold needed."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn("fold", (hash_bucket(key, salt) % k).cast("bigint"))


def kfold_sql(key_expr: str, k: int, salt: str = "") -> str:
    """DuckDB twin of :func:`kfold_assign`'s fold expression."""
    return f"CAST({hash_bucket_sql(key_expr, salt)} % {k} AS BIGINT)"


def permutation_index(df: DataFrame, id_col: str, salt: str = "") -> DataFrame:
    """Exact dense 0-based global rank of every row in (portable-hash, id)
    order — a uniform deterministic permutation of the dataset, as a
    ``(id, _idx)`` pair table.

    Built WITHOUT a global window (a no-partition ``row_number`` is one
    task at scale): rows bucket by the hash's high bits (~4096 buckets),
    rank within buckets, and add the tiny cumulative bucket-offset table
    back broadcast — the bucket id is a monotone prefix of the hash
    order, so the result EQUALS the global rank while the sort runs
    bucket-parallel (the sessionize_bucketed trick applied to ranking).
    Shuffles carry (id, hash) pairs only. The salt is suffixed ``|perm``
    so a caller's other draws from the same salt stay independent.

    CONTRACT: ``id_col`` must be unique — duplicate ids get distinct
    ranks here and then multiply through any join back to the rows
    (shard sizes and manifests silently double-count). Dedup first
    (``dedup.exact_dedup`` / ``dropDuplicates``) if ids can repeat.
    """
    from pyspark.sql import Window

    idc = F.col(id_col)
    h = hash_bucket(id_col, salt + "|perm")
    b = F.floor(h / F.lit(1 << 20)).cast("bigint")  # 4096 buckets of 2^20
    # `_rkb` is the repo-wide RESERVED name for bounded bucket-id columns
    # that order an offset-stitch window (tools/window_lint.py exempts
    # exactly this name; user data must never reuse it).
    wb = Window.partitionBy("_rkb").orderBy(F.col("_h").asc(), idc.asc())
    ranked = (
        df.select(idc)
        .withColumn("_h", h)
        .withColumn("_rkb", b)
        .withColumn("_rn", F.row_number().over(wb))
    )
    counts = ranked.groupBy("_rkb").agg(F.count(F.lit(1)).alias("_c"))
    woff = (
        Window.orderBy("_rkb").rowsBetween(Window.unboundedPreceding, -1)
    )  # window over ≤4096 rows — trivially single-task safe
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_c").over(woff), F.lit(0)))
    return (
        ranked.join(F.broadcast(offsets.select("_rkb", "_off")), "_rkb")
        .withColumn("_idx", F.col("_off") + F.col("_rn") - 1)
        .select(idc, "_idx")
    )


def shard_assignment(
    df: DataFrame,
    id_col: str,
    shard_size: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic training-shard assignment: globally permute the rows
    by portable hash (:func:`permutation_index`) and cut the permutation
    into fixed-size shards — the "shuffle once, shard for the trainer"
    export step of a data pipeline (epoch order must be reproducible and
    independent of how the corpus happened to be partitioned).

    Adds ``shard = idx // shard_size`` and ``shard_pos = idx % shard_size``
    to the input rows. All shards except the last are exactly
    ``shard_size`` rows; membership and order are stable across reruns,
    partitionings, and engines, and re-drawable with a different ``salt``
    (= a new epoch permutation). One ids-only ranking pass plus one join
    back to the full rows keyed on ``id_col`` — which inherits
    :func:`permutation_index`'s contract that ``id_col`` is UNIQUE
    (duplicates would multiply through this join and corrupt shard
    sizes); dedup first if ids can repeat.
    """
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    idx = permutation_index(df, id_col, salt)
    return (
        df.join(idx, id_col)
        .withColumn(
            "shard", F.floor(F.col("_idx") / F.lit(shard_size)).cast("bigint")
        )
        .withColumn("shard_pos", (F.col("_idx") % F.lit(shard_size)).cast("bigint"))
        .drop("_idx")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling: each row (the anchor) is paired
    with ``k`` pseudo-random OTHER rows — the contrastive-training staple
    (word2vec/SimCLR-style negatives) with reruns producing identical
    pairs.

    Rows are ranked once by portable hash (a uniform permutation, built
    bucket-parallel by :func:`permutation_index`); each anchor's j-th
    negative is the row at index ``hash(id, salt·j) mod (n−1)``,
    skip-adjusted so an anchor never draws itself. Shuffles carry ids and
    indexes only. The row count n stays IN-PLAN (1-row aggregate
    cross-joined broadcast) — construction fires no Spark job; the
    need-2-rows validation runs in-plan via ``raise_error`` when a lone
    anchor row evaluates it (an EMPTY input produces no anchor rows, so
    it yields an empty result rather than raising — callers guarding
    against an accidentally-empty corpus should check the count they
    already have at ingest).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    idc = F.col(id_col)
    indexed = permutation_index(df, id_col, salt)
    nrow = indexed.agg(F.count(F.lit(1)).alias("_n"))
    anchors = indexed.select(idc.alias("anchor_id"), F.col("_idx").alias("_aidx"))
    draws = anchors.crossJoin(F.broadcast(nrow)).select(
        "anchor_id",
        "_aidx",
        "_n",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("neg_rank"),
    )
    modulus = F.when(
        F.col("_n") < 2,
        F.raise_error(F.lit("need at least 2 rows to draw negatives")).cast("bigint"),
    ).otherwise(F.col("_n") - 1)
    raw = hash_bucket(
        F.concat(F.col("anchor_id").cast("string"), F.lit("#"), F.col("neg_rank").cast("string")),
        salt + "|neg",
    ) % modulus
    # skip-adjust: indexes ≥ own index shift up by one, so self is excluded
    # while the draw stays uniform over the other n−1 rows
    neg_idx = F.when(raw >= F.col("_aidx"), raw + 1).otherwise(raw)
    pairs = draws.withColumn("_nidx", neg_idx)
    negs = indexed.select(idc.alias("negative_id"), F.col("_idx").alias("_nidx"))
    return (
        pairs.join(negs, "_nidx")
        .select("anchor_id", F.col("neg_rank").cast("bigint").alias("neg_rank"), "negative_id")
    )


def grouped_split(
    df: DataFrame,
    group_key: Union[str, Column],
    test_fraction: float,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/test split: the split decision hashes the GROUP
    key (source domain, URL host, author, session), so every row of a
    group lands in the same split. Row-level splits leak near-duplicates
    across the boundary — two scrapes of the same page land in train AND
    test and inflate eval scores; grouping by provenance is the standard
    control (the GroupShuffleSplit contract).

    Same portable-hash membership as :func:`train_test_split` — no
    shuffle, no RNG state, stable across partitionings/engines/reruns,
    and re-drawable with a different ``salt``.
    """
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    is_test = hash_bucket(group_key, salt) < int(test_fraction * _BUCKETS)
    return df.withColumn(
        split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def shard_manifest(
    sharded: DataFrame,
    content_cols: Sequence[str],
    shard_col: str = "shard",
) -> DataFrame:
    """Per-shard manifest for a training-data export: row count plus an
    order-independent content digest — what a trainer (or the next
    pipeline run) checks to prove the shards it sees are exactly the
    shards that were written (reproducibility audits, resumable
    transfers, "did the re-export change anything" diffs).

    Digest = Σ over rows of the first 14 hex chars of
    md5(concat_ws('|', content_cols)) as an integer, summed exactly as
    DECIMAL — commutative, so the digest is independent of row order,
    partitioning, and engine (the same md5-prefix convention as
    :func:`hash_bucket`; 14 hex = 56 bits keeps every addend inside a
    portable integer). One map-side hash + one shard-keyed aggregate.
    """
    digest = F.conv(
        F.substring(F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in content_cols])), 1, 14),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        sharded.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(digest).cast("decimal(38,0)").cast("string").alias("content_digest"),
        )
    )


def balanced_sample(
    df: DataFrame,
    class_col: str,
    key: Union[str, Column],
    salt: str = "",
) -> DataFrame:
    """Class-balanced downsampling: every class keeps ≈ the row count of
    the SMALLEST class (rate_c = min_count / count_c), with membership a
    pure deterministic function of (key, salt) — the rebalancing step
    before training on skewed labels, reproducible across partitionings,
    retries, engines, and corpus growth (stratified_sample with the
    rates derived from the data instead of supplied).

    Scale: one count aggregate per class, the per-class thresholds stay
    IN-PLAN (class-count table cross-joined with the 1-row min, then
    broadcast back onto the data — no eager driver action), and the
    filter is the same portable md5 bucket as deterministic_sample.
    """
    cls = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("_nc"))
    mn = cls.agg(F.min("_nc").alias("_mnc"))
    rates = cls.crossJoin(F.broadcast(mn)).select(
        F.col(class_col),
        F.floor(
            F.col("_mnc").cast("double") / F.col("_nc") * F.lit(float(_BUCKETS))
        )
        .cast("bigint")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(rates), class_col)
        .filter(hash_bucket(key, salt) < F.col("_thr"))
        .drop("_thr")
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    key: Union[str, Column] = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-based domain rebalancing: target weights derived from
    the OBSERVED group sizes as ``w_g ∝ count_g^alpha`` (the multilingual-
    pretraining staple — alpha<1 upweights rare domains/languages without
    a hand-written recipe; alpha=1 keeps natural proportions, alpha=0 is
    uniform). Downsampling-only, like :func:`mixture_sample`: output size
    is the largest reachable without upsampling, and membership is the
    portable md5 hash of ``key`` — deterministic across runs,
    partitionings, and engines.

    Everything stays IN-PLAN: one tiny per-group count aggregate, the
    ``pow``/normalization on those few rows, and a broadcast join back.
    Per-group keep fractions round at 9 decimals before the threshold
    floor so both engines' libm pow() land in the same bucket.
    """
    if key is None:
        raise ValueError("key (a stable row identifier) is required")
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    wsum = Window.partitionBy()
    p = F.pow(F.col("_cnt").cast("double"), F.lit(float(alpha)))
    norm = counts.withColumn("_w", p).withColumn(
        "_p", F.col("_w") / F.sum("_w").over(wsum)
    )
    n_out = F.min(F.col("_cnt") / F.col("_p")).over(wsum)
    frac = F.round(
        F.least(F.lit(1.0), n_out * F.col("_p") / F.col("_cnt")), 9
    )
    thresholds = norm.select(
        group_col, F.floor(frac * F.lit(float(_BUCKETS))).alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(hash_bucket(key, salt) < F.col("_thr"))
        .drop("_thr")
    )


def rendezvous_reshard(
    df: DataFrame,
    key_col: str,
    n_old: int,
    n_new: int,
) -> DataFrame:
    """Reshard-movement planner: how much data a shard-count change from
    ``n_old`` to ``n_new`` forces to MOVE, under the naive scheme versus
    rendezvous hashing — the pre-flight run before rescaling a 100 TB
    keyed layout, where the answer decides between an hour and a week of
    shuffle:

    - ``mod``: shard = hash(key) % n — the default everywhere, and the
      trap: changing n remaps almost EVERY key (expected moved fraction
      ≈ 1 − 1/lcm-ish, ~90% for 8→10);
    - ``rendezvous`` (highest-random-weight, Thaler & Ravishankar 1998):
      shard = argmax over shards of hash(key, shard). Growing the fleet
      moves a key ONLY if one of the NEW shards wins its argmax —
      expected moved fraction is the optimal 1 − n_old/n_new (~20% for
      8→10), no ring maintenance, pure per-row math.

    Scale shape: distinct keys explode ×``n_new`` candidate weights
    (bounded fan-out, flat md5 expressions, no UDF), one window rank per
    scheme keyed on the key (tiny per-key partitions), then one summary
    aggregate; output is one row per scheme with movement and balance
    readouts. Deterministic md5 weights — hash-exact against the DuckDB
    oracle (catalog ``sample_rendezvous_reshard``); ties (2^-56) break
    to the lower shard id identically in both engines.

    Returns (scheme, n_keys, n_moved, moved_frac, max_shard_keys,
    min_shard_keys) — min/max over the NEW layout's shards."""
    if not (0 < n_old and 0 < n_new):
        raise ValueError(f"shard counts must be positive, got {n_old}->{n_new}")
    from .rollup import kmv_hash56

    keys = df.select(F.col(key_col).cast("string").alias("_k")).distinct()
    # mod scheme: one narrow expression per key
    h = kmv_hash56(F.col("_k"))
    mod = keys.select(
        F.lit("mod").alias("scheme"),
        F.col("_k"),
        F.pmod(h, F.lit(n_old)).alias("_old"),
        F.pmod(h, F.lit(n_new)).alias("_new"),
    )
    # rendezvous: weight(key, shard) = portable 56-bit md5 order
    # statistic. Candidates span BOTH layouts' shard ids — a shrink
    # (n_new < n_old) must still see the old layout's high shards, or
    # every key reads as unmoved
    n_span = max(int(n_old), int(n_new))
    cand = keys.select(
        "_k",
        F.explode(F.sequence(F.lit(0), F.lit(n_span - 1))).alias("_s"),
    ).select(
        "_k",
        "_s",
        kmv_hash56(F.concat(F.col("_k"), F.lit("#"), F.col("_s").cast("string"))).alias(
            "_w"
        ),
    )
    # argmax without a window: pack (weight, shard) into one BIGINT —
    # w·128 + (127−s) ≤ 2^63−1 for w < 2^56, s < 128 — and take a plain
    # conditional MAX per key (map-side combined, skew-free; a window
    # rank would also drag every key's spare shards into one NULL
    # partition for the old-layout rank). Decode: s = 127 − packed % 128.
    if n_new > 128 or n_old > 128:
        raise ValueError("rendezvous packing supports up to 128 shards")
    packed = F.col("_w") * F.lit(128) + (F.lit(127) - F.col("_s"))
    hrw = (
        cand.groupBy("_k")
        .agg(
            F.max(F.when(F.col("_s") < n_old, packed)).alias("_po"),
            F.max(F.when(F.col("_s") < n_new, packed)).alias("_pn"),
        )
        .select(
            F.lit("rendezvous").alias("scheme"),
            "_k",
            (F.lit(127) - F.pmod(F.col("_po"), F.lit(128))).alias("_old"),
            (F.lit(127) - F.pmod(F.col("_pn"), F.lit(128))).alias("_new"),
        )
    )
    both = mod.unionByName(hrw)
    # balance over the FULL new layout: a shard receiving zero keys must
    # read min_shard_keys = 0, not vanish from the report — the dead
    # shard is exactly the imbalance this planner exists to surface
    dom = (
        both.select("scheme")
        .distinct()
        .select(
            "scheme",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_new) - 1))).alias("_s"),
        )
        .select("scheme", F.col("_s").cast("bigint").alias("_new"))
    )
    obs = both.groupBy("scheme", "_new").agg(F.count(F.lit(1)).alias("_l"))
    loads = (
        dom.join(obs, ["scheme", "_new"], "left")
        .groupBy("scheme")
        .agg(
            F.max(F.coalesce(F.col("_l"), F.lit(0)))
            .cast("bigint")
            .alias("max_shard_keys"),
            F.min(F.coalesce(F.col("_l"), F.lit(0)))
            .cast("bigint")
            .alias("min_shard_keys"),
        )
    )
    moved = both.groupBy("scheme").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("_old") != F.col("_new"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_moved"),
    )
    return (
        moved.join(loads, "scheme")
        .select(
            "scheme",
            "n_keys",
            "n_moved",
            F.round(
                F.col("n_moved").cast("double") / F.col("n_keys").cast("double"), 6
            ).alias("moved_frac"),
            "max_shard_keys",
            "min_shard_keys",
        )
        .orderBy("scheme")
    )


def weighted_reservoir_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Union[str, Column],
    weight: Union[str, Column],
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted reservoir sampling per group, algorithm A-ES (Efraimidis
    & Spirakis 2006): each row draws u = (hash(key)+1)/2^32 ∈ (0,1] and
    the k rows with the largest u^(1/w) win — inclusion probability
    proportional to weight, which is exactly the quality-weighted
    "keep the best k documents per source, but not deterministically
    top-k" draw of corpus curation. Ranking uses the monotone-equivalent
    ln(u)/w (descending): numerically tame and reproducible across
    engines, since u derives from the portable md5 hash — same
    determinism contract as :func:`reservoir_per_group` (stable across
    runs, partitionings, engines; re-salt for an independent draw).

    Rows with NULL, NaN, or non-positive weight are EXCLUDED (u^(1/w)
    is undefined there — a zero-weight row should never be sampled, and
    NaN both passes a bare ``> 0`` comparison AND sorts above every
    finite rank under Spark's ordering, so it would monopolize the
    sample). Keys must be UNIQUE within a group (the
    :func:`reservoir_per_group` precondition): duplicate keys draw
    identical (u, aes) and the tie-broken row_number picks arbitrarily
    among them, which also voids the streaming merge-equals-batch
    contract. One shuffle on the group key; skewed groups pre-thin with
    :func:`deterministic_sample` exactly as reservoir_per_group
    documents."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w_col = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    u = (hash_bucket(key, salt) + F.lit(1)).cast("double") / F.lit(float(_BUCKETS))
    aes = F.log(u) / w_col
    key_col = F.col(key) if isinstance(key, str) else key
    win = Window.partitionBy(*group_cols).orderBy(aes.desc(), key_col)
    return (
        df.filter((w_col > 0) & ~F.isnan(w_col))
        .withColumn("_rs", F.row_number().over(win))
        .filter(F.col("_rs") <= k)
        .drop("_rs")
    )
