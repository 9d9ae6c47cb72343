"""Connected components over a pair list — the completion step of a
near-dup pipeline (SURVEY.md §2.C extensions): LSH/Jaccard emit PAIRS,
but deduplication must drop whole duplicate *clusters*, i.e. the
connected components of the pair graph, keeping one canonical doc each.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log n) rounds of pure groupBy/join DataFrame ops, unlike naive label
propagation whose round count is the graph diameter. Every round is one
shuffle keyed by node id with map-side combine; no driver-side graph.

Scale notes:

* each iteration ends in ``localCheckpoint`` — iterative plans otherwise
  grow lineage exponentially and re-execute from the source every round
  (on a cluster with a fault-tolerance requirement, swap for
  ``checkpoint()`` against a durable dir; the cut is what matters);
* convergence is detected by comparing a per-round edge-set signature
  (count + xxhash sum) — two scalars per round, no driver collect of
  edges;
* duplicate clusters from near-dup detection are near-cliques, so in
  practice 2-3 rounds suffice; the O(log n) bound covers adversarial
  chains.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to the
    minimum of N(u) ∪ {u}."""
    both = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    m = both.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        both.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small; for each node u, connect u and all its
    smaller neighbors to the minimum of those."""
    oriented = edges.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    grouped = oriented.groupBy("u").agg(
        F.min("v").alias("m"), F.collect_set("v").alias("vs")
    )
    # (v, m) for v in N(u) ∪ {u}, v != m
    return (
        grouped.select(
            F.explode(F.array_union(F.col("vs"), F.array(F.col("u")))).alias("a"),
            F.col("m").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve the undirected pair graph to components.

    Returns ``(id, component)`` for every node that appears in ``pairs``,
    where ``component`` is the smallest node id in its component (so a
    component's canonical representative is its own label).
    """
    edges = (
        pairs.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        # decimal sum: ANSI mode is on, a long sum of xxhash64 overflows
        sig = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
            ).cast("string").alias("h"),
        ).collect()[0]
        if (sig["n"], sig["h"]) == prev_sig:
            break
        prev_sig = (sig["n"], sig["h"])
    # fixpoint: every edge is (member, root). Roots label themselves.
    members = edges.select(F.col("a").alias("id"), F.col("b").alias("component"))
    roots = edges.select(F.col("b").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.unionByName(roots).distinct()


def drop_near_duplicates(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one canonical doc (the min-id member) per duplicate cluster;
    docs in no cluster pass through. One anti-join against the non-canonical
    member set — the tiny side of the graph, never the corpus."""
    cc = connected_components(pairs)
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("_loser")
    )
    return docs.join(
        F.broadcast(losers), docs[id_col] == F.col("_loser"), "left_anti"
    )


def shortest_paths(
    edges: DataFrame,
    landmarks: list,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 6,
    cut_lineage: bool = True,
    stats: Optional[dict] = None,
) -> DataFrame:
    """Unweighted shortest-path (hop) distances from a set of landmark
    vertices over an undirected graph — the GraphFrames ``shortestPaths``
    shape (landmark distance vectors feed graph features, reachability
    audits, and hub-distance blocking keys).

    Multi-source BFS as DataFrame rounds: the frontier starts at the
    landmarks (distance 0); each round joins the frontier with the edge
    list (keyed on vertex id), min-aggregates the new ``(vertex,
    landmark)`` candidates, and anti-joins the already-settled set so
    every pair is settled exactly once at its first (= shortest) hop
    count. BFS settles each pair at its minimum distance, so rounds are
    monotone and the loop ends when the frontier empties or ``max_hops``
    is reached (bounded-hop semantics are part of the contract — at 100 TB
    you cap the radius, you don't run to diameter).

    Scale shape: per round one hash join keyed on vertex id + one
    map-side-combined min-agg + one anti-join keyed on (vertex,
    landmark); payloads are (id, id, int) triples only. Lineage is cut
    per round (:func:`connected_components` rationale); convergence reads
    ONE scalar (frontier count) per round. Returns ``(vertex, landmark,
    distance)`` for every pair within ``max_hops``. The frontier-empty
    check IS the settled early exit (every reachable pair settles at its
    first hop, so an empty frontier is the BFS fixed point — later
    rounds are no-ops BY CONSTRUCTION, the bit-identical LPA exit
    contract); ``stats`` receives ``{"rounds": n, "converged": bool}``
    where ``converged`` means the frontier emptied within the budget.

    ``cut_lineage=False`` disables the per-round checkpoints so the FULL
    logical plan (all frontier joins) stays inspectable — a plan-audit /
    debugging switch for small graphs only (tests assert the rounds plan
    as hash joins through it); production runs keep the default.
    """
    def _cut(df, eager=True):
        return df.localCheckpoint(eager=eager) if cut_lineage else df

    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = _cut(
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct(),
        eager=False,
    )
    lm = [int(x) for x in landmarks]
    if not lm:
        raise ValueError("landmarks must be non-empty")
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(v, v, 0) for v in lm], "vertex long, landmark long, distance int"
    )
    settled = frontier
    rounds = 0
    converged = False
    for _ in range(max_hops):
        nxt = (
            frontier.join(und, frontier.vertex == und.a)
            .select(
                F.col("b").alias("vertex"),
                "landmark",
                (F.col("distance") + F.lit(1)).alias("distance"),
            )
            .groupBy("vertex", "landmark")
            .agg(F.min("distance").alias("distance"))
            .join(settled.select("vertex", "landmark"), ["vertex", "landmark"], "left_anti")
        )
        nxt = _cut(nxt)
        rounds += 1
        if nxt.isEmpty():
            converged = True
            break
        settled = _cut(settled.unionByName(nxt), eager=False)
        frontier = nxt
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return settled.select(
        "vertex", "landmark", F.col("distance").cast("int").alias("distance")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    num_iter: int = 10,
    tol: Optional[float] = 1e-4,
    stats: Optional[dict] = None,
) -> DataFrame:
    """Simplified PageRank by power iteration over a directed edge list —
    the per-vertex importance formula ``r = (1-d) + d·Σ r_in/deg_out``
    (ranks sum to ≈N, the unnormalized convention of the classic Spark
    example; dangling vertices contribute nothing per round).

    Scale shape: each iteration is one join of the edge list with the
    current rank vector (both keyed on the source id — co-partitioned
    after the first round, so AQE reuses the partitioning) and one
    dst-keyed aggregation with map-side combine. Lineage is cut every
    round with ``localCheckpoint`` (same rationale as
    :func:`connected_components`); ``num_iter`` is the round budget —
    power iteration converges geometrically at rate ``damping``, so 10
    rounds ≈ 1e-1…1e-2 relative error, enough for ranking use.

    ``tol`` is the convergence early exit and the DEFAULT at scale
    (round 10; 1e-4 — the GraphX ``runUntilConvergence`` convention):
    stop once the max absolute per-vertex rank change of a round falls
    below ``tol``, turning ``num_iter`` into a round BUDGET — one scalar
    aggregate per round over the checkpointed vectors, the same
    driver-side convergence contract as :func:`k_core`. On graphs that
    settle early (the common case for near-dup/cluster graphs) this
    skips the converged tail rounds the r8 probes measured as the
    entire cost at 30× volume. Pass ``tol=None`` for exact fixed-round
    semantics — the contract hash oracles encode (rank values after an
    early exit differ from the fixed-round values by < tol, which is
    immaterial for ranking use but not bit-exact). ``stats`` receives
    ``{"rounds": n, "converged": bool}``.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edge list with degree attached once, reused every round
    ed = e.join(out_deg, "src").localCheckpoint(eager=False)
    ranks = verts.withColumn("rank", F.lit(1.0))
    rounds = 0
    converged = False
    for _ in range(num_iter):
        contribs = (
            ed.join(ranks, ed.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            verts.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=tol is not None)
        )
        rounds += 1
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.select("id", F.col("rank").alias("_prev")), "id"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("d"))
                .collect()[0]["d"]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                converged = True
                break
        else:
            ranks = new_ranks
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return ranks


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-vertex triangle participation counts over an undirected graph —
    the clustering/cohesion primitive (community detection, spam/bot
    subgraph detection, graph feature engineering).

    Algorithm (Cohen's MapReduce triangle enumeration / the degree-ordered
    wedge join): canonicalize edges undirected-distinct, then direct every
    edge from its LOWER-degree endpoint to the higher (ties by id). Each
    triangle then has exactly one wedge centered at its lowest-degree
    vertex, and the wedge count is Σ_v deg⁺(v)² with deg⁺ bounded by
    O(√m) — the self-join never blows up on a hub vertex the way the
    naive a<b<c three-way join does (a celebrity vertex with degree 1M
    yields 1e12 naive wedges but only ~m^1.5 degree-ordered ones).
    Wedges (a→b, a→c) are then semi-joined against the directed edge set
    on (b, c) — one hash join keyed on the edge pair.

    Scale: two shuffles (degree agg, wedge join) plus the final vertex
    explode+agg; every payload is an id pair. Output is one row per
    vertex that participates in ≥1 triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("_db"))
    # direct low-degree -> high-degree (ties by id): deg+ is O(sqrt(m))
    lowhigh = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("_da") < F.col("_db"))
                | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("_e")
        )
        .select("_e.lo", "_e.hi")
    )
    w1 = lowhigh.select(F.col("lo").alias("ctr"), F.col("hi").alias("x"))
    w2 = lowhigh.select(F.col("lo").alias("ctr"), F.col("hi").alias("y"))
    wedges = (
        w1.join(w2, "ctr")
        .filter(F.col("x") < F.col("y"))
        .select("ctr", "x", "y")
    )
    # closing edge may be directed either way after degree orientation —
    # match on the undirected canonical form
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi")
    return (
        tris.select(
            F.explode(F.array(F.col("ctr"), F.col("x"), F.col("y"))).alias("vertex")
        )
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    num_iter: int = 5,
    early_exit: bool = True,
    stats: Optional[dict] = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (LPA): every
    vertex starts with its own id as label and each round adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST label
    — the deterministic synchronous variant (classic async LPA is
    order-dependent; determinism is what makes this testable and
    rerun-stable in a pipeline).

    Each round is one join of the undirected edge list with the current
    label vector (both keyed on vertex id — co-partitioned after round 1)
    and one (vertex, label) count aggregate with map-side combine;
    lineage is cut per round like :func:`connected_components` /
    :func:`pagerank`. ``num_iter`` is the round BUDGET: with
    ``early_exit`` (default) the loop stops as soon as a round changes
    zero labels — synchronous LPA is a deterministic function of the
    label vector, so once a round is an identity every further round is
    too, and the result is bit-identical to running the full budget.
    The per-round change count is one scalar aggregate riding the
    checkpoint the round materializes anyway (the k_core convergence
    contract); the r8 scale probes showed rounds are the ENTIRE cost
    tail at 30× volume, so not running converged rounds is the knob.
    ``stats`` (optional dict) receives ``{"rounds": n, "converged":
    bool}`` for probes/tests.
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    verts = und.select(F.col("a").alias("id")).distinct()
    labels = verts.withColumn("label", F.col("id"))
    rounds = 0
    converged = False
    for _ in range(num_iter):
        nbr = (
            und.join(labels, und.b == labels.id)
            .select(F.col("a").alias("id"), "label")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        w = Window.partitionBy("id").orderBy(F.col("_n").desc(), F.col("label").asc())
        new_labels = (
            nbr.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("id", "label")
            .localCheckpoint(eager=early_exit)
        )
        rounds += 1
        if early_exit:
            # changed = vertices whose label differs from last round; the
            # semi-join runs on the two checkpointed label vectors (id,
            # label payloads only) — one scalar per round
            changed = (
                new_labels.join(labels, ["id", "label"], "left_anti")
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        else:
            labels = new_labels
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels.select("id", F.col("label").cast("bigint").alias("label"))


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where every
    vertex keeps degree ≥ k — the standard densest-region peel (spam/bot
    ring detection, community cores, visualization backbones).

    Iterative peel: drop vertices with degree < k, recompute degrees on
    the induced subgraph, repeat until stable. Each round is one degree
    aggregate plus two semi-joins keyed on vertex ids; lineage is cut per
    round and the loop stops on a fixed point (the per-round scalar is
    one edge count — the same driver-side convergence contract as the
    k-means/logistic rounds). The result is unique regardless of peel
    order (k-core is order-independent), so the operator is
    deterministic by construction.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = -1
    for _ in range(max_iter):
        n_edges = e.count()
        if n_edges == prev or n_edges == 0:
            break
        prev = n_edges
        deg = (
            e.select(F.col("a").alias("v"))
            .unionByName(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("v")
        e = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    deg = (
        e.select(F.col("a").alias("vertex"))
        .unionByName(e.select(F.col("b").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )
    return deg


def drop_near_duplicates_best(
    docs: DataFrame,
    pairs: DataFrame,
    score,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate cluster removal keeping each cluster's BEST member
    (highest ``score``, ties by smallest id) instead of the arbitrary
    min-id canonical of :func:`drop_near_duplicates` — the
    production-curation policy (two scrapes of one page are not
    interchangeable; keep the cleaner capture), applied at the CLUSTER
    level the way `dedup.exact_dedup_best` applies it per fingerprint.

    Shape: resolve components, join member ids to their scores (ids +
    scores only — never document payloads), one window per component for
    the keeper, then a single anti-join of the corpus against the loser
    set (the tiny side)."""
    from pyspark.sql import Window

    cc = connected_components(pairs)
    scored = cc.join(
        docs.select(F.col(id_col).alias("id"), score.alias("_s")), "id"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("_s").desc(), F.col("id").asc()
    )
    losers = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > 1)
        .select(F.col("id").alias("_loser"))
    )
    return docs.join(
        F.broadcast(losers), docs[id_col] == F.col("_loser"), "left_anti"
    )


def link_prediction_bipartite(
    edges: DataFrame,
    left_col: str,
    right_col: str,
    min_common: int = 2,
    max_postings: int = 1000,
) -> DataFrame:
    """Link-prediction scores between LEFT vertices of a bipartite graph
    (customer–product, user–tag, doc–entity): common neighbors,
    Adamic–Adar (common neighbors discounted by 1/ln(degree) — a shared
    RARE item says more than a shared popular one), and Jaccard overlap
    of neighborhoods — the classic "people who bought X also…"
    candidate scorer.

    Scale: the pair generation is the LSH-banding shape — a self-join
    keyed by the RIGHT vertex, so pair volume is Σ_r deg(r)², bounded by
    dropping right vertices with more than ``max_postings`` neighbors
    (boilerplate items score ~0 Adamic–Adar anyway; the cap is the same
    degenerate-bucket guard as MinHash-LSH). Only (id, id, weight)
    triples flow through the shuffle; per-item 1/ln(deg) weights round(6)
    then DECIMAL-sum so scores are engine-exact.
    """
    e = edges.select(
        F.col(left_col).alias("_l"), F.col(right_col).alias("_r")
    ).distinct()
    deg_r = e.groupBy("_r").agg(F.count(F.lit(1)).alias("_dr"))
    deg_l = e.groupBy("_l").agg(F.count(F.lit(1)).alias("_dl"))
    # degree-1 right vertices can't form a pair, and 1/ln(1) is infinite —
    # drop them with the posting cap in one filter
    kept = e.join(
        deg_r.filter((F.col("_dr") >= 2) & (F.col("_dr") <= max_postings)), "_r"
    ).withColumn(
        "_w",
        F.round(F.lit(1.0) / F.log(F.col("_dr").cast("double")), 6).cast(
            "decimal(28,6)"
        ),
    )
    a = kept.select(F.col("_r").alias("_ra"), F.col("_l").alias("left_a"), "_w")
    b = kept.select(F.col("_r").alias("_rb"), F.col("_l").alias("left_b"))
    pairs = (
        a.join(b, F.col("_ra") == F.col("_rb"))
        .filter(F.col("left_a") < F.col("left_b"))
        .groupBy("left_a", "left_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("_w").cast("double").alias("adamic_adar"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    da = deg_l.select(F.col("_l").alias("left_a"), F.col("_dl").alias("_da"))
    db = deg_l.select(F.col("_l").alias("left_b"), F.col("_dl").alias("_db"))
    return (
        pairs.join(da, "left_a")
        .join(db, "left_b")
        .select(
            "left_a",
            "left_b",
            "n_common",
            F.round(F.col("adamic_adar"), 6).alias("adamic_adar"),
            F.round(
                F.col("n_common")
                / (F.col("_da") + F.col("_db") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "vertex",
    community_col: str = "label",
) -> DataFrame:
    """Newman modularity Q of a community assignment over an undirected
    graph: Q = Σ_c (e_c/m − (d_c/2m)²) — the standard "are these
    communities real" score (≈0 for random structure, ~0.3+ for strong
    structure). The evaluation companion to ``label_propagation``:
    LPA proposes, modularity grades.

    Shape: edges dedup to undirected form once, two broadcast-joins
    attach endpoint communities, then everything reduces to the tiny
    per-community (internal-edge count, degree sum) table. All counting
    is exact integer; degree-sum squares route through DOUBLE (the
    100 TB overflow rule); one row out.

    Coverage contract: edges whose endpoints lack an assignment are
    EXCLUDED from Q (inner join) and their count is surfaced as
    ``n_edges_dropped`` — a stale or partial assignment scores the
    covered subgraph, visibly, never silently.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("_a"),
            F.greatest(F.col(src), F.col(dst)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    asg_a = assignment.select(
        F.col(node_col).alias("_a"), F.col(community_col).alias("_ca")
    )
    asg_b = assignment.select(
        F.col(node_col).alias("_b"), F.col(community_col).alias("_cb")
    )
    from ..caching import scoped_persist

    und = scoped_persist(und)
    tagged = scoped_persist(und.join(asg_a, "_a").join(asg_b, "_b"))
    m_all = und.agg(F.count(F.lit(1)).cast("long").alias("_mall"))
    m = tagged.agg(F.count(F.lit(1)).cast("double").alias("_m"))
    internal = (
        tagged.filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("_ec"))
    )
    # degree sum per community: each endpoint contributes 1 per incident edge
    deg = (
        tagged.select(F.col("_ca").alias("_c"))
        .unionByName(tagged.select(F.col("_cb").alias("_c")))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).cast("long").alias("_dc"))
    )
    per = deg.join(internal, "_c", "left").crossJoin(F.broadcast(m))
    term = F.round(
        F.coalesce(F.col("_ec"), F.lit(0)) / F.col("_m")
        - (F.col("_dc") / (F.lit(2.0) * F.col("_m")))
        * (F.col("_dc") / (F.lit(2.0) * F.col("_m"))),
        9,
    ).cast("decimal(28,9)")
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        F.max("_m").cast("bigint").alias("n_edges"),
        F.round(F.sum(term).cast("double"), 6).alias("modularity"),
    ).crossJoin(F.broadcast(m_all)).select(
        "n_communities",
        "n_edges",
        (F.col("_mall") - F.col("n_edges")).cast("bigint").alias("n_edges_dropped"),
        "modularity",
    )


def connected_components_incremental(
    assign: DataFrame,
    new_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Incremental connected components: fold a delta batch of edges into
    an existing ``(id, component)`` assignment WITHOUT re-reading the
    original edge set — the ingest-side maintenance step for near-dup
    clusters (new LSH pairs arrive; only the clusters they touch can
    change). Result is IDENTICAL to full CC over (original ∪ delta)
    edges: each existing assignment row is a star edge id→component, and
    a component's star is connectivity-equivalent to its original
    subgraph, so CC over (touched stars ∪ delta edges) relabels exactly
    the merged clusters.

    Scale shape: the delta's endpoints semi-join out the touched
    components (small), untouched assignment rows pass through with ZERO
    recompute (anti-join), and the large-star/small-star rounds run on
    |touched members| + |delta| rows — never the corpus's full edge
    history. Labels stay min-id canonical, so merges of two old clusters
    deterministically adopt the smaller label.
    """
    new_edges = new_pairs.select(
        F.col(src).cast("long").alias("id_a"), F.col(dst).cast("long").alias("id_b")
    )
    a = assign.select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
    )
    delta_nodes = (
        new_edges.select(F.col("id_a").alias("id"))
        .unionByName(new_edges.select(F.col("id_b").alias("id")))
        .distinct()
    )
    touched = (
        a.join(delta_nodes, "id", "left_semi").select("component").distinct()
    )
    affected = a.join(F.broadcast(touched), "component", "left_semi")
    untouched = a.join(F.broadcast(touched), "component", "left_anti")
    star_edges = affected.select(
        F.col("id").alias("id_a"), F.col("component").alias("id_b")
    ).filter(F.col("id_a") != F.col("id_b"))
    merged = connected_components(
        star_edges.unionByName(new_edges), max_iter=max_iter
    )
    return untouched.select("id", "component").unionByName(
        merged.select("id", "component")
    )
