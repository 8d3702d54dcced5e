"""Spatial join operators built on grid bucketing (functions.geo).

``radius_join``: all (left, right) pairs within ``radius_km``. Right
side gets its grid cell; left side explodes its 3x3 neighborhood and
equi-joins on cell, then the exact haversine filter runs on the
(locally small) candidate set. Cell size must be ≥ radius expressed
in degrees at the highest latitude of interest — pass it explicitly.
Shuffle volume is O(9·|left| + |right|), never |left|×|right|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.geo import grid_cell, haversine_km, neighbor_cells


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
