"""Spatial joins built on grid blocking — radius pairs and
point-in-polygon, both without a cross join.

``radius_join``: all (left, right) pairs within ``radius_km``. Right
side gets its grid cell; left side explodes its 3x3 neighborhood and
equi-joins on cell, then the exact haversine filter runs on the
(locally small) candidate set. Cell size must be ≥ radius expressed
in degrees at the highest latitude of interest — pass it explicitly.
Shuffle volume is O(9·|left| + |right|), never |left|×|right|.

``spatial_join`` (point-in-polygon): Spark has no native spatial
join; the scalable composition is the standard two-phase
filter-and-refine:

1. **Grid blocking (filter)** — each polygon registers every fixed-size
   grid cell its bounding box covers (bbox from one pass over the
   vertex array; cell enumeration is a 2-D ``sequence`` explode). Each
   point lands in exactly ONE cell, so candidates come from an
   EQUI-join on the cell id — and each (point, polygon) candidate pair
   appears at most once, no post-join dedupe.
2. **Exact refine** — even-odd ray casting evaluated as a pure
   higher-order Column over the vertex array (count edges crossed by
   the +x ray from the point; odd = inside). No UDF, no Python in the
   hot path, codegen-friendly.

Cell size is the caller's tuning knob: ~the median polygon diameter
keeps the per-polygon cell fan-out O(1) while keeping cells selective.
A polygon table with a few continent-sized outliers fans those out
over many cells — cap with ``max_cells_per_poly`` (skipped polygons
surface in the returned audit, the same honest-drop contract as the
LSH hot-bucket caps).

The reference stores lat/lon but never joins on geometry
(``dags/main.py`` keeps coordinates as plain columns); this operator
is part of the added geospatial tier with `geo_distance_radius` /
`morton_geo` (SURVEY §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.geo import grid_cell, haversine_km, neighbor_cells

__all__ = [
    "radius_join",
    "nearest_join",
    "point_in_polygon",
    "polygon_cell_count",
    "polygon_cells",
    "point_cell",
    "spatial_join",
]


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_deg: float,
    left_lat: str = "lat",
    left_lon: str = "lon",
    right_lat: str = "lat",
    right_lon: str = "lon",
    distance_alias: str = "distance_km",
    scale: int = 3,
) -> DataFrame:
    """Pairs within ``radius_km``; distance attached, rounded to
    ``scale`` dp (rounded in the oracle identically).

    Left and right coordinate column names must be distinct — after
    the cell equi-join both sides' columns coexist, so shared names
    would make every downstream reference ambiguous.
    """
    if {left_lat, left_lon} & {right_lat, right_lon}:
        raise ValueError(
            "left and right lat/lon column names must differ (got "
            f"left=({left_lat},{left_lon}) right=({right_lat},{right_lon})); "
            "rename one side before joining"
        )
    l_cells = left.withColumn(
        "_cell", F.explode(neighbor_cells(left_lat, left_lon, cell_deg))
    )
    r_cells = right.withColumn("_cell", grid_cell(right_lat, right_lon, cell_deg))
    joined = l_cells.join(r_cells, "_cell").drop("_cell")
    dist = F.round(
        haversine_km(left_lat, left_lon, right_lat, right_lon), scale
    )
    return joined.withColumn(distance_alias, dist).filter(
        F.col(distance_alias) <= radius_km
    )


def point_in_polygon(px: Column, py: Column, poly: Column) -> Column:
    """Even-odd ray-casting test; ``poly`` is ``array<struct<x,y>>``
    (closing edge last→first implied). Boundary points follow the
    half-open convention of the crossing rule (an edge counts when it
    spans the point's y as [min, max) — consistent, not symmetric).
    """
    n = F.size(poly)
    idx = F.sequence(F.lit(1), n)

    def crosses(i: Column) -> Column:
        a = F.element_at(poly, i)
        b = F.element_at(poly, F.when(i == n, 1).otherwise(i + 1))
        ax, ay, bx, by = a["x"], a["y"], b["x"], b["y"]
        spans = (ay > py) != (by > py)
        # x of the edge at height py; (by-ay) != 0 whenever `spans`
        x_at = (bx - ax) * (py - ay) / (by - ay) + ax
        return spans & (px < x_at)

    return F.size(F.filter(idx, crosses)) % 2 == 1


def _cell_bounds(poly: Column, cell_size: float) -> tuple[Column, ...]:
    xs = F.transform(poly, lambda p: p["x"])
    ys = F.transform(poly, lambda p: p["y"])
    return (
        F.floor(F.array_min(xs) / cell_size),
        F.floor(F.array_max(xs) / cell_size),
        F.floor(F.array_min(ys) / cell_size),
        F.floor(F.array_max(ys) / cell_size),
    )


def polygon_cell_count(poly: Column, cell_size: float) -> Column:
    """How many grid cells the polygon's bbox covers — pure bbox
    arithmetic, NO enumeration. The cap in :func:`spatial_join` must
    test this BEFORE building the cell array: a degenerate polygon's
    cell array is exactly the blowup the cap exists to prevent, so
    size-of-the-materialized-array is the one predicate that cannot
    guard it."""
    cx0, cx1, cy0, cy1 = _cell_bounds(poly, cell_size)
    return (cx1 - cx0 + 1) * (cy1 - cy0 + 1)


def polygon_cells(
    poly: Column, cell_size: float
) -> Column:
    """All grid-cell ids (``bigint``) covered by the polygon's bbox.
    Cell id packs (cx, cy) as cx*2^21 + cy over offset-shifted floor
    indices — collision-free for |coordinate/cell_size| < 2^20."""
    cx0, cx1, cy0, cy1 = _cell_bounds(poly, cell_size)
    return F.flatten(
        F.transform(
            F.sequence(cx0, cx1),
            lambda cx: F.transform(
                F.sequence(cy0, cy1), lambda cy: _cell_id(cx, cy)
            ),
        )
    )


def _cell_id(cx: Column, cy: Column) -> Column:
    off = F.lit(1 << 20).cast("long")
    return (cx.cast("long") + off) * F.lit(1 << 21).cast("long") + (
        cy.cast("long") + off
    )


def point_cell(x: Column, y: Column, cell_size: float) -> Column:
    return _cell_id(F.floor(x / cell_size), F.floor(y / cell_size))


def spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    poly_col: str = "poly",
    cell_size: float = 1.0,
    max_cells_per_poly: int | None = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(joined, skipped)``: every (point row ⨝ polygon row)
    pair where the point lies inside the polygon, plus the audit of
    polygons skipped for covering more than ``max_cells_per_poly``
    grid cells (degenerate/outlier geometries — re-run them at a
    coarser ``cell_size`` or clip them upstream; silently joining them
    would fan one row out over millions of cells).
    """
    n_cells = polygon_cell_count(F.col(poly_col), cell_size)
    # NULL n_cells (NULL/empty geometry) must surface in the audit, not
    # vanish between two filters that are both never-true for NULL
    # (review finding — the honest-drop contract covers bad geometry too)
    if max_cells_per_poly is not None:
        skipped = polygons.filter(
            (n_cells > max_cells_per_poly) | n_cells.isNull()
        )
        kept = polygons.filter(n_cells <= max_cells_per_poly)
    else:
        skipped = polygons.filter(n_cells.isNull())
        kept = polygons.filter(n_cells.isNotNull())
    blocked = kept.withColumn(
        "_cell", F.explode(polygon_cells(F.col(poly_col), cell_size))
    )
    pts = points.withColumn(
        "_cell", point_cell(F.col(x_col), F.col(y_col), cell_size)
    )
    joined = (
        pts.join(blocked, "_cell")
        .filter(
            point_in_polygon(F.col(x_col), F.col(y_col), F.col(poly_col))
        )
        .drop("_cell")
    )
    return joined, skipped


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    cell_deg: float,
    left_key: str,
    right_key: str,
    left_lat: str = "lat",
    left_lon: str = "lon",
    right_lat: str = "rlat",
    right_lon: str = "rlon",
    scale: int = 3,
) -> DataFrame:
    """EXACT nearest neighbor per left row: ``(left_key, right_key,
    dist_km)`` with ties broken (rounded distance, then lower right
    key) — "nearest station per property", the canonical real-estate
    enrichment the reference's plain lat/lon columns cannot answer.

    Two phases, both exact in composition:

    1. **Grid fast path** — left explodes its 3×3 cell neighborhood,
       equi-joins right's cells, argmins the candidates. That argmin
       is PROVABLY the true nearest iff the best candidate lies
       closer than the neighborhood's guaranteed-coverage radius
       ``R_safe(lat)``: any uncovered point differs by > ``cell_deg``
       in latitude (≥ 111.19·cell_deg km) or in longitude (≥ the
       haversine lower bound at the worst covered latitude). The
       certificate is evaluated per row, from the UNROUNDED best
       candidate distance.
    2. **Exact fallback** — rows with no candidate or an uncertified
       one re-resolve against the full (broadcast) right side.

    At production POI densities (the workload this models: millions
    of POIs, nearest almost always inside the home cell) the fast
    path certifies nearly everything and the fallback is a stray-row
    cleanup; on sparse synthetic data the split shifts, but the
    ANSWER never changes — tests pin fast==fallback row-for-row.
    Scale shape: O(9·|left| + |right|) shuffle for the fast path,
    |fallback|·|right| broadcast work for the tail; never a full
    cross join unless the data genuinely defeats the grid.

    Caveat: the flat grid does not wrap the antimeridian — a nearest
    neighbor across ±180° longitude sits in a non-adjacent cell AND
    defeats the longitude lower bound, so inputs must not straddle
    the dateline (true of this repo's synthetic coordinates; handle
    production wrap with an S2/H3-style cell scheme or by splitting
    the ±180 band into its own fallback set).
    """
    import math

    if {left_lat, left_lon} & {right_lat, right_lon}:
        raise ValueError(
            "left and right lat/lon column names must differ (got "
            f"left=({left_lat},{left_lon}) right=({right_lat},{right_lon}))"
        )
    km_per_deg = 6371.0 * math.pi / 180.0
    dist_raw = haversine_km(left_lat, left_lon, right_lat, right_lon)
    pick = F.struct(
        F.round(dist_raw, scale).alias("d"), F.col(right_key).alias("k")
    )

    def argmin(cand: DataFrame) -> DataFrame:
        return cand.groupBy(left_key).agg(
            F.min(pick).alias("_best"),
            F.min(dist_raw).alias("_raw"),
        )

    r_cells = right.withColumn(
        "_cell", grid_cell(right_lat, right_lon, cell_deg)
    )
    l_cells = left.withColumn(
        "_cell", F.explode(neighbor_cells(left_lat, left_lon, cell_deg))
    )
    fast = argmin(l_cells.join(r_cells, "_cell"))
    # R_safe: min of the lat-direction bound and the lon-direction
    # haversine bound at the worst covered latitude |lat| + cell_deg
    cos_m = F.cos(
        F.radians(F.least(F.abs(F.col(left_lat)) + cell_deg, F.lit(90.0)))
    )
    r_lon = (
        2.0
        * 6371.0
        * F.asin(cos_m * math.sin(math.radians(cell_deg) / 2.0))
    )
    r_safe = F.least(F.lit(km_per_deg * cell_deg), r_lon)
    # Margin (ADVICE r4): the winner is picked by (round(dist, scale),
    # key) but certified on the UNROUNDED best. An uncovered point with
    # raw distance >= r_safe could still round to the same scale-value
    # as the certified best and win the (d, k) tie-break on a lower
    # key — so require the best to clear r_safe by half an ulp of the
    # rounding grid, making a rounding tie with any uncovered point
    # impossible.
    half_ulp = 0.5 * 10.0 ** (-scale)
    # persist: `certified` feeds BOTH the result union and (via the
    # anti-join) the fallback's input — without it the grid join +
    # argmin execute three times in one plan (measured 2.2s → ~0.8s at
    # sf0.1). Plain persist: bounded, AQE-compatible, plan-dedup'd.
    certified = (
        left.join(fast, left_key)
        .filter(F.col("_raw") + half_ulp < r_safe)
        .select(left_key, F.col("_best.k").alias(right_key), F.col("_best.d").alias("dist_km"))
        .persist()
    )
    rest = left.join(certified.select(left_key), left_key, "left_anti")
    fallback = argmin(rest.crossJoin(F.broadcast(right))).select(
        left_key,
        F.col("_best.k").alias(right_key),
        F.col("_best.d").alias("dist_km"),
    )
    return certified.unionByName(fallback)
