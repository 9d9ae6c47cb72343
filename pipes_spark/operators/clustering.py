"""Distributed clustering over embedding columns: spherical k-means (Lloyd)
and SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540 — cluster embeddings, then drop near-identical members
within each cluster).

In the reference every one of these would be hand-rolled state inside a
``MiddleFunc`` (ref: pipe/node.go:16-19); here each Lloyd round is a
declarative assign→aggregate pass that Catalyst plans.

Scale (100 TB design points):

* **Assignment is map-side only**: one Arrow-batched numpy matmul per batch
  against the broadcast codebook (k×dim floats — KBs). No shuffle.
* **Centroid update is ONE tiny shuffle per round**: per-dimension means via
  ``groupBy(cluster).agg(sum(element_at(vec, i)))`` — partial (map-side)
  aggregation shrinks the exchange to k×(dim+1) cells per task regardless of
  corpus size. Sums are DECIMAL(38,18) — exact and order-independent, so a
  fit is bit-reproducible across partitionings, retries, and cluster sizes
  (float partial-agg combine order is nondeterministic; decimal is not).
* **Lineage is cut every round**: each round recomputes assignments from the
  base scan with the new (driver-held, tiny) codebook — there is no growing
  iterative lineage and nothing to checkpoint.
* **SemDeDup never goes all-pairs**: candidate pairs come from a self-join
  on the cluster id, and degenerate clusters are capped at ``max_cluster``
  members (hash-deterministic cap) exactly like the LSH bucket cap — the
  pair count is bounded by sum(min(|c|, cap)²), not n².
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .scale import ensure_min_partitions
from .similarity import cosine, l2_norm

# Exact, order-independent per-dimension accumulator: |v| ≤ 1 for unit-norm
# embedding components, so 20 integer digits cover sums over ~1e19 rows.
_ACC = "decimal(38,18)"


def _unit_udf():
    """Unit-normalizing Arrow UDF, one numpy pass per batch (map-side; the
    flat-expression alternative would duplicate the 64-term norm chain per
    component and trip the giant-expression-tree JIT limit, and the
    higher-order-function form is interpreted per element). IEEE double
    ops — bit-deterministic across runs and partitionings. Built lazily:
    pandas_udf parses its return type against the ACTIVE session, so module
    import must not construct it."""

    @F.pandas_udf("array<double>")
    def _unit(v: pd.Series) -> pd.Series:
        import numpy as np

        X = np.vstack(v.to_numpy()).astype("float64")
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        return pd.Series(list(Xn))

    return _unit


def kmeans_init(
    df: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic init: the first ``k`` vectors in xxhash64(id) order,
    unit-normalized. One bounded collect (k rows) — same convention as
    ``similarity.fit_ivf_centroids``."""
    rows = (
        df.select(F.col(id_col).alias("_id"), _unit_udf()(F.col(vec_col)).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id") + seed))
        .limit(k)
        .collect()
    )
    return [list(map(float, r["_v"])) for r in rows]


def assign_clusters(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Input plus a ``cluster_id`` column: argmax cosine against the
    (broadcast, tiny) codebook. Map-side only — one numpy matmul per Arrow
    batch, ties broken by lowest cluster index (argmax convention)."""
    C_list = [list(map(float, c)) for c in centroids]

    @F.pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        import numpy as np

        M = np.array(C_list, dtype="float64")
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        X = np.vstack(v.to_numpy()).astype("float64")
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        return pd.Series((Xn @ Mn.T).argmax(axis=1).astype("int32"))

    return df.withColumn("cluster_id", nearest(F.col(vec_col)))


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 12,
) -> list[list[float]]:
    """Distributed spherical k-means: Lloyd iterations where assignment is a
    map-side Arrow matmul and the centroid update is one k×dim-cell shuffle
    (see module docstring). Returns the codebook as a plain list (k×dim —
    KBs; the only driver-side state).

    Unlike ``similarity.fit_ivf_centroids`` (numpy on a bounded sample — the
    faiss ingest convention), this fits on the FULL corpus: the right tool
    when cluster quality matters more than fit latency (SemDeDup pruning).
    Centroids are rounded to ``round_decimals`` each round so the fit is
    reproducible verbatim by any engine that sums exactly."""
    import numpy as np

    unit = df.select(F.col(id_col).alias("_id"), _unit_udf()(F.col(vec_col)).alias("_v"))
    dim = len(unit.select("_v").first()[0])
    C = kmeans_init(unit, k, seed=seed, id_col="_id", vec_col="_v")
    k = len(C)  # corpus smaller than k: every vector its own centroid

    sums = [
        F.sum(F.element_at(F.col("_v"), i).cast(_ACC)).alias(f"s{i}")
        for i in range(1, dim + 1)
    ]
    for _ in range(iters):
        agg = (
            assign_clusters(unit, C, id_col="_id", vec_col="_v")
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        by_id = {r["cluster_id"]: r for r in agg}
        newC = []
        for j in range(k):
            r = by_id.get(j)
            if r is None:  # empty cluster: keep the previous centroid
                newC.append(C[j])
                continue
            m = np.array([float(r[f"s{i}"]) for i in range(1, dim + 1)]) / r["n"]
            norm = max(float(np.linalg.norm(m)), 1e-300)
            newC.append([round(x / norm, round_decimals) for x in m])
        C = newC
    return C


def kmeans_cluster_stats(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster size and mean cosine-to-centroid (the spherical inertia
    report). One map-side Arrow pass computes (cluster_id, cosine) together
    — the codebook is KBs, embedded in the UDF, never shuffled — then a
    k-row aggregate. The mean accumulates as DECIMAL so the report is
    order-independent like the fit itself."""
    C_list = [list(map(float, c)) for c in centroids]

    @F.pandas_udf("struct<cluster_id:int, sim:double>")
    def best(v: pd.Series) -> pd.DataFrame:
        import numpy as np

        M = np.array(C_list, dtype="float64")
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        X = np.vstack(v.to_numpy()).astype("float64")
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        S = Xn @ Mn.T
        idx = S.argmax(axis=1)
        return pd.DataFrame(
            {"cluster_id": idx.astype("int32"), "sim": S[np.arange(len(idx)), idx]}
        )

    return (
        df.select(best(F.col(vec_col)).alias("_b"))
        .select("_b.cluster_id", "_b.sim")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(
                F.sum(F.col("sim").cast(_ACC)).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_cosine"),
        )
    )


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: Optional[int] = 2000,
    min_partitions: Optional[int] = None,
) -> DataFrame:
    """SemDeDup candidate pairs: (id_a < id_b, cosine ≥ threshold) where both
    members landed in the same k-means cluster.

    The self-join key is the cluster id, so pair work is sum(|c|²) over
    clusters, never n² — with ``max_cluster`` capping degenerate clusters
    the same hash-deterministic way the LSH bucket cap does (drop the
    overflow, keep the hash-smallest members; at sane k the cap never
    fires). The exact cosine inside runs as the unrolled JVM-side chain."""
    dim = len(df.select(vec_col).first()[0])
    assigned = assign_clusters(
        ensure_min_partitions(df.select(id_col, vec_col), min_partitions),
        centroids,
        id_col=id_col,
        vec_col=vec_col,
    )
    if max_cluster is not None:
        w = Window.partitionBy("cluster_id").orderBy(
            F.xxhash64(F.col(id_col)), F.col(id_col)
        )
        assigned = assigned.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= max_cluster
        ).drop("_rk")
    a = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
    )
    b = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
    )
    pairs = a.join(b, on="cluster_id").filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>"), dim)
    return (
        pairs.withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def semantic_dedup_keep(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup keep-set: drop the higher id of every near-duplicate pair
    (transitively safe — a row survives only if it is not the loser of ANY
    pair). Losers are distinct ids — small relative to the corpus by the
    near-dup premise — broadcast into an anti-join."""
    losers = (
        semantic_dedup_pairs(df, centroids, threshold, id_col, vec_col)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(F.broadcast(losers), on=id_col, how="left_anti")


def silhouette_stats(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette score per cluster — the
    standard clustering-quality readout: for each point, a = cosine
    distance to its OWN centroid, b = distance to the nearest OTHER
    centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; near 1 means tight,
    well-separated clusters, near 0 overlapping ones. The centroid-based
    simplification (a/b against centroids, not all pairwise members) is
    the form that scales — one map-side Arrow pass against the broadcast
    codebook, one k-row aggregate; the full pairwise silhouette is O(n²)
    and dies long before 100 TB.

    Returns one row per cluster (cluster_id, n_members, avg_silhouette)
    plus the ``overall`` row (cluster_id −1), derived from the SAME
    k-row per-cluster DECIMAL sums — the data scans once, and the
    DECIMAL-summed means keep the report order-independent.
    """
    C_list = [list(map(float, c)) for c in centroids]

    @F.pandas_udf("struct<cluster_id:int, s:double>")
    def sil(v: pd.Series) -> pd.DataFrame:
        import numpy as np

        M = np.array(C_list, dtype="float64")
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        X = np.vstack(v.to_numpy()).astype("float64")
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        D = 1.0 - Xn @ Mn.T  # cosine distance to every centroid
        idx = D.argmin(axis=1)
        a = D[np.arange(len(idx)), idx]
        D2 = D.copy()
        D2[np.arange(len(idx)), idx] = np.inf
        b = D2.min(axis=1)
        denom = np.maximum(np.maximum(a, b), 1e-300)
        return pd.DataFrame(
            {"cluster_id": idx.astype("int32"), "s": (b - a) / denom}
        )

    # sil is pure; nondeterministic stops CollapseProject inlining the
    # struct alias into both field extractions (two Arrow passes over the
    # corpus — guide §4.4; plan-swept r12)
    per_point = ensure_min_partitions(df.select(vec_col)).select(
        sil.asNondeterministic()(F.col(vec_col)).alias("_r")
    ).select("_r.cluster_id", "_r.s")
    # keep the exact DECIMAL sums so the overall row derives from the
    # k-row table — the Arrow UDF pass runs exactly once
    sums = per_point.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum(F.col("s").cast(_ACC)).alias("_ssum"),
    )
    per_cluster = sums.select(
        "cluster_id",
        "n_members",
        F.round(F.col("_ssum").cast("double") / F.col("n_members"), 6).alias(
            "avg_silhouette"
        ),
    )
    overall = sums.agg(
        F.lit(-1).cast("int").alias("cluster_id"),
        F.sum("n_members").cast("bigint").alias("n_members"),
        F.round(
            F.sum("_ssum").cast("double") / F.sum("n_members"), 6
        ).alias("avg_silhouette"),
    )
    return per_cluster.unionByName(overall)
