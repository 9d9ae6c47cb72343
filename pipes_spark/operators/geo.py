"""Geospatial operators: grid-blocked nearest-neighbour joins on
lat/lon columns (SURVEY.md §2.C extensions — the spatial member of the
blocked-join family alongside MinHash-LSH banding and SimHash byte
pigeonholes).

Scale (100 TB design point): a naive nearest-POI join is points × POIs —
dead on arrival. The scalable shape is the same candidate-generation /
exact-verify split every similarity operator here uses:

* both sides key by a ``radius``-sized lat/lon GRID CELL (integer pair);
* each point probes its 3×3 cell neighbourhood (bounded ×9 fan-out —
  any POI within ``radius_km`` of the point lies in one of those cells
  as long as the cell edge ≥ radius);
* the join is a plain equi-join on the cell key (hash shuffle, AQE
  skew-split on dense cells);
* the exact haversine runs only on surviving candidates, and a
  row_number window keeps the nearest POI per point (deterministic
  (distance, poi_id) tie-break).

Degenerate geographies: the cell width uses the longitude degree at the
worst-case |latitude| of the data (cos shrinks lon degrees toward the
poles); above ~85° the 3×3 neighbourhood no longer guarantees coverage —
callers with polar data should bucket on lat bands instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2) -> F.Column:
    """Great-circle distance in km between two (degree) coordinate pairs —
    pure codegen column math, no UDF."""
    rad = math.pi / 180.0
    dphi = (lat2 - lat1) * rad / 2.0
    dlmb = (lon2 - lon1) * rad / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlmb) * F.sin(dlmb)
    )
    # clamp: float drift can push a to 1 + ε and asin out of domain
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def geo_nearest_join(
    points: DataFrame,
    pois: DataFrame,
    radius_km: float,
    point_id: str = "point_id",
    poi_id: str = "poi_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """For every point, the nearest POI within ``radius_km`` (points with
    no POI in range drop out — compose with a left join against the
    input for NULL semantics). See module docstring for the blocking
    design. Returns (point_id, poi_id, distance_km) with distance
    rounded at 6.
    """
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    # cell edge in degrees: ≥ radius in BOTH axes at the worst |lat|
    lat_deg = radius_km / 111.0
    lon_deg = radius_km / (111.0 * math.cos(math.radians(max_abs_lat)))
    cell = max(lat_deg, lon_deg)

    def cell_of(lat, lon):
        return (
            F.floor(lat / F.lit(cell)).cast("long"),
            F.floor(lon / F.lit(cell)).cast("long"),
        )

    p_cy, p_cx = cell_of(F.col(lat_col), F.col(lon_col))
    probe = points.select(
        F.col(point_id),
        F.col(lat_col).alias("_plat"),
        F.col(lon_col).alias("_plon"),
        p_cy.alias("_cy0"),
        p_cx.alias("_cx0"),
    ).select(
        point_id,
        "_plat",
        "_plon",
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("_dy"),
        "_cy0",
        "_cx0",
    ).select(
        point_id,
        "_plat",
        "_plon",
        (F.col("_cy0") + F.col("_dy")).alias("_cy"),
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("_dx"),
        "_cx0",
    ).select(
        point_id,
        "_plat",
        "_plon",
        "_cy",
        (F.col("_cx0") + F.col("_dx")).alias("_cx"),
    )
    q_cy, q_cx = cell_of(F.col(lat_col), F.col(lon_col))
    cand = probe.join(
        pois.select(
            F.col(poi_id),
            F.col(lat_col).alias("_qlat"),
            F.col(lon_col).alias("_qlon"),
            q_cy.alias("_cy"),
            q_cx.alias("_cx"),
        ),
        ["_cy", "_cx"],
    )
    scored = cand.withColumn(
        "distance_km",
        F.round(
            haversine_km(
                F.col("_plat"), F.col("_plon"), F.col("_qlat"), F.col("_qlon")
            ),
            6,
        ),
    ).filter(F.col("distance_km") <= radius_km)
    w = Window.partitionBy(point_id).orderBy(
        F.col("distance_km").asc(), F.col(poi_id).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(point_id, poi_id, "distance_km")
    )


def geo_hotspots(
    points: DataFrame,
    cell_km: float = 1.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    min_count: int = 1,
    max_abs_lat: float = 60.0,
) -> DataFrame:
    """Spatial hotspot surface: activity count per grid cell plus the
    3×3-neighbourhood-smoothed density (a Getis-Ord-style local
    statistic without the variance term) — "where is activity
    clustering" for ops dashboards and geo-skew diagnosis.

    One groupBy to cell counts (map-side combined), then the bounded
    ×9 explode of the COMPACT cell table joined back to itself — the
    neighbourhood sum never touches row-level data. Density ratio =
    cell count / neighbourhood count; a cell that holds most of its
    neighbourhood's mass is a spike, not a plateau.
    """
    from ..caching import scoped_persist

    lat_deg = cell_km / 111.0
    lon_deg = cell_km / (111.0 * math.cos(math.radians(max_abs_lat)))
    cell = max(lat_deg, lon_deg)
    # the compact cell table feeds both the neighbourhood spread and the
    # final join — persist so the row-level scan runs once
    cells = scoped_persist(
        points.select(
            F.floor(F.col(lat_col) / F.lit(cell)).cast("long").alias("cy"),
            F.floor(F.col(lon_col) / F.lit(cell)).cast("long").alias("cx"),
        ).groupBy("cy", "cx").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    spread = (
        cells.select(
            F.col("cy").alias("_cy0"), F.col("cx").alias("_cx0"), F.col("n").alias("_n")
        )
        .select(
            "_cy0",
            "_cx0",
            "_n",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_dy"),
        )
        .select(
            (F.col("_cy0") + F.col("_dy")).alias("cy"),
            "_cx0",
            "_n",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_dx"),
        )
        .select("cy", (F.col("_cx0") + F.col("_dx")).alias("cx"), "_n")
    )
    hood = spread.groupBy("cy", "cx").agg(
        F.sum("_n").cast("bigint").alias("hood_n")
    )
    return (
        cells.join(hood, ["cy", "cx"])
        .filter(F.col("n") >= min_count)
        .select(
            "cy",
            "cx",
            "n",
            "hood_n",
            F.round(F.col("n") / F.col("hood_n").cast("double"), 6).alias(
                "density_ratio"
            ),
        )
    )


def density_scaled_cells(
    points: DataFrame,
    x_col: str,
    y_col: str,
    extent: float,
    target_posting: int = 25,
    out_col: str = "cell",
    stride: int = 1_000_000,
) -> DataFrame:
    """Snap (x, y) coordinates to a grid whose resolution SCALES WITH
    POINT DENSITY — the default cell derivation for the trajectory join.

    A fixed grid is the measured density trap: 10× points on the same
    cells is 10× postings per cell and therefore ~100× candidate pairs
    (tools/scale_probe.py ``trajectory_10x``: 6.1 s → 339 s fixed vs
    23 s density-scaled). This helper keeps the EXPECTED per-cell posting
    at ``target_posting`` regardless of data volume: cells-per-axis
    r = ceil(sqrt(n / target_posting)), cell width w = ceil(extent / r),
    cell id = floor(x/w)·stride + floor(y/w).

    The point count n stays IN-PLAN (1-row aggregate cross-joined
    broadcast — construction fires no Spark job), and every arithmetic
    step (double sqrt/ceil, then floor of a small-int division) is
    bit-identical in Spark and DuckDB, so an oracle can restate the
    derivation verbatim. ``stride`` must exceed the max y-axis cell index
    (extent/w ≤ r+1 — the default 10⁶ covers any extent below 10⁶·w).
    """
    n1 = points.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    # empty input: n=0 → r=0 → extent/0 = Infinity, and CAST(Infinity AS
    # BIGINT) THROWS under ANSI when the 1-row projection evaluates —
    # clamp the axis count to ≥1 so an empty table yields zero pairs
    # instead of CAST_OVERFLOW.
    r = F.greatest(
        F.ceil(F.sqrt(F.col("_n") / F.lit(float(target_posting)))), F.lit(1)
    ).cast("bigint")
    w = F.ceil(F.lit(float(extent)) / r).cast("bigint")
    cell = (
        F.floor(F.col(x_col) / F.col("_w")) * F.lit(stride)
        + F.floor(F.col(y_col) / F.col("_w"))
    ).cast("bigint")
    return (
        points.crossJoin(F.broadcast(n1.select(w.alias("_w"))))
        .withColumn(out_col, cell)
        .drop("_w")
    )


def trajectory_jaccard_pairs(
    visits: DataFrame,
    id_col: str = "user_id",
    cell_col: str = "cell",
    threshold: float = 0.1,
    max_cell_posting: int = None,
) -> DataFrame:
    """Trajectory similarity join over visited-cell SETS (the distributed
    top-k trajectory-similarity problem of REPOSE, ICDE 2021, reduced to
    its grid-snapped set form): entities whose movement footprints overlap
    — Jaccard of the distinct grid cells each entity visited — above
    ``threshold``.

    Scale shape: the posting-list self-join (the LSH-banding/AllPairs
    shape) — candidates must share a CELL, so the join key is the cell,
    the shuffle carries (cell, id) pairs, and nothing ever goes n².
    Entity set sizes are a tiny table broadcast onto the surviving pairs.
    Hot cells (airports) fatten postings quadratically — measured: a
    fixed grid under 10× entities produced 100× candidate pairs
    (tools/scale_probe.py trajectory_10x). Knobs, in order: scale grid
    resolution with density; set ``max_cell_posting`` to gate the
    densest cells out of candidate GENERATION (the minhash
    ``max_bucket`` pattern — lossy: a pair sharing ONLY gated cells is
    missed and survivors' shared counts become lower bounds; set sizes
    stay exact); or generate candidates with `dedup.similar_sets`
    (set-MinHash LSH) and keep this exact join as the verifier.
    """
    v = visits.select(F.col(id_col), F.col(cell_col).alias("_c")).distinct()
    sizes = v.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    cand = v
    if max_cell_posting is not None:
        hot = (
            v.groupBy("_c")
            .agg(F.count(F.lit(1)).alias("_pc"))
            .filter(F.col("_pc") > max_cell_posting)
            .select("_c")
        )
        cand = v.join(F.broadcast(hot), "_c", "left_anti")
    a = cand.select(F.col(id_col).alias("id_a"), "_c")
    b = cand.select(F.col(id_col).alias("id_b"), "_c")
    shared = (
        a.join(b, "_c")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_cells"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_sb"))
    jac = F.round(
        F.col("shared_cells")
        / (F.col("_sa") + F.col("_sb") - F.col("shared_cells")),
        6,
    )
    return (
        shared.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("shared_cells").cast("bigint").alias("shared_cells"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
