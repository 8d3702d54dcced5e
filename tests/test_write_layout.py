"""Write-layout pruning, MEASURED: a Z-order-clustered parquet layout
must let a min/max-stats pruner skip far more row groups on 2D bbox
queries than unsorted or single-column-sorted layouts of the same data.

The measurement reads parquet footers directly (pyarrow), counting row
groups whose (lat, lon) min/max envelope intersects each box — exactly
the decision Spark's parquet reader makes from the same stats, but
deterministic and engine-independent. The key scale property asserted:
a single-column sort is FLOORED at that column's selectivity (~2% lat
here) no matter how fine the row groups, while the z-order layout's
read fraction keeps falling toward the box AREA (0.04%) as granularity
increases — at 100 TB that is the difference between scanning 2 TB and
40 GB for a map-tile query. Everything is deterministic (hash-scatter
data, fixed boxes), so the thresholds are exact, not flaky bounds.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.zorder import morton_key_2d
from geoestate_etl_spark.sources.parquet_io import write_zordered_table

N = 200_000
LAT, LON = (-70.0, 70.0), (-170.0, 170.0)
# four ~2% x 2% boxes in different quadrants (one near the origin —
# the z-curve's worst seam), each ~0.04% of the area
BOXES = [
    (10.0, 12.8, 40.0, 46.8),
    (-50.0, -47.2, -120.0, -113.2),
    (30.0, 32.8, 100.0, 106.8),
    (0.5, 3.3, 0.5, 7.3),
]
RG_BYTES = 4 * 1024  # tiny row groups so toy scale has ~1000 of them


@pytest.fixture(scope="module")
def points(spark):
    # deterministic pseudo-random scatter (hash-based, no RNG state)
    df = spark.range(N).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), 140_000) / 1000.0 - 70.0).alias("lat"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 340_000) / 1000.0 - 170.0).alias("lon"),
    )
    return df.persist()


def _read_fraction(path: str) -> tuple[int, float]:
    """(total row groups, mean fraction of rows a stats pruner must
    read across BOXES)."""
    total = rows = 0
    rows_needed = [0] * len(BOXES)
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = pq.ParquetFile(f)
        idx = {pf.schema_arrow.names.index(c): c for c in ("lat", "lon")}
        for i in range(pf.num_row_groups):
            rg = pf.metadata.row_group(i)
            total += 1
            rows += rg.num_rows
            st = {c: rg.column(j).statistics for j, c in idx.items()}
            for b, (la, lb, na, nb) in enumerate(BOXES):
                if not (
                    st["lat"].max < la
                    or st["lat"].min > lb
                    or st["lon"].max < na
                    or st["lon"].min > nb
                ):
                    rows_needed[b] += rg.num_rows
    assert rows == N
    return total, sum(rows_needed) / (rows * len(BOXES))


def _bbox_counts(spark, path) -> list[int]:
    df = spark.read.parquet(path)
    return [
        df.filter(
            F.col("lat").between(la, lb) & F.col("lon").between(na, nb)
        ).count()
        for (la, lb, na, nb) in BOXES
    ]


def test_zorder_layout_prunes_2d_bbox(spark, points, tmp_path_factory):
    d = tmp_path_factory.mktemp("layout")
    p_unsorted = str(d / "unsorted")
    p_latsort = str(d / "latsort")
    p_zorder = str(d / "zorder")

    points.repartition(8).write.option(
        "parquet.block.size", str(RG_BYTES)
    ).parquet(p_unsorted)
    points.repartitionByRange(8, "lat").sortWithinPartitions("lat").write.option(
        "parquet.block.size", str(RG_BYTES)
    ).parquet(p_latsort)
    zkey = morton_key_2d("lat", "lon", *LAT, *LON)
    write_zordered_table(points, p_zorder, zkey, n_files=8, row_group_bytes=RG_BYTES)

    # identical data in all three layouts
    counts = {p: _bbox_counts(spark, p) for p in (p_unsorted, p_latsort, p_zorder)}
    assert counts[p_unsorted] == counts[p_latsort] == counts[p_zorder]
    assert sum(counts[p_zorder]) > 0

    t_u, frac_u = _read_fraction(p_unsorted)
    t_l, frac_l = _read_fraction(p_latsort)
    t_z, frac_z = _read_fraction(p_zorder)
    assert min(t_u, t_l, t_z) >= 500  # granularity: the test is meaningful

    # unsorted: near-full-range stats in every group -> no pruning
    assert frac_u > 0.9
    # lat-sort is floored at lat selectivity (~2%) + boundary effects
    assert 0.015 < frac_l < 0.05
    # z-order prunes on BOTH axes: >=3x better than the single-column
    # floor and under 1% of rows for ~0.04% boxes (measured 0.42%)
    assert frac_z < frac_l / 3
    assert frac_z < 0.01
