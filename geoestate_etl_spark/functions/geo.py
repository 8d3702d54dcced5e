"""Geospatial expression builders (the reference's lat/lon surface,
``dags/main.py:267-268``, grown into a real spatial toolkit).

All pure Column expressions (JVM trig, codegen-friendly). The scale
strategy for spatial joins is grid bucketing: map each point to a
fixed-degree cell, equi-join on cell (+ neighbors for radius
queries), then exact-filter with haversine — the 2D analogue of the
bucketized range join, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_KM = 6371.0


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def haversine_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Great-circle distance in km (haversine formula, double precision)."""
    la1, lo1, la2, lo2 = (F.radians(_c(x)) for x in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(la1) * F.cos(la2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def in_bbox(
    lat: Column | str,
    lon: Column | str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> Column:
    """Bounding-box predicate — sargable, pushes to the scan."""
    la, lo = _c(lat), _c(lon)
    return (
        (la >= F.lit(lat_min))
        & (la <= F.lit(lat_max))
        & (lo >= F.lit(lon_min))
        & (lo <= F.lit(lon_max))
    )


def grid_cell(lat: Column | str, lon: Column | str, cell_deg: float) -> Column:
    """Fixed-degree grid cell id "gy:gx" — the spatial bucketing key.

    Writing a table partitioned/bucketed by this key gives partition
    pruning for bbox queries and co-located spatial joins.
    """
    gy = F.floor(_c(lat) / F.lit(cell_deg)).cast(T.LongType())
    gx = F.floor(_c(lon) / F.lit(cell_deg)).cast(T.LongType())
    return F.concat_ws(":", gy, gx)


def neighbor_cells(lat: Column | str, lon: Column | str, cell_deg: float) -> Column:
    """Array of the point's 3x3 grid neighborhood — the probe side of a
    radius join explodes this, turning distance search into an
    equi-join on cell ids."""
    gy = F.floor(_c(lat) / F.lit(cell_deg)).cast(T.LongType())
    gx = F.floor(_c(lon) / F.lit(cell_deg)).cast(T.LongType())
    cells = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cells.append(F.concat_ws(":", gy + dy, gx + dx))
    return F.array(*cells)
