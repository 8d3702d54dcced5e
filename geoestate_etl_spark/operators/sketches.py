"""Count-min sketch over DataFrames: sub-linear frequency estimation.

A CMS is d hash rows × w buckets of counters; estimate(key) = min over
rows of its bucket counter. Overestimates only (collisions add).
Here the sketch is built with ONE groupBy over (depth, bucket) —
a map-side-combinable aggregation whose output is d·w rows regardless
of input size — and queried with a broadcast join of the probe keys.
Hashing is xxhash64 with per-depth salts (deterministic everywhere).

Use over exact groupBy counts when the key cardinality is huge and
only point estimates for a few keys are needed — the sketch shuffles
d·w counters, not one row per distinct key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bucket(key_col, depth: int, width: int):
    return F.pmod(F.xxhash64(key_col, F.lit(depth)), F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt) — d·w rows total."""
    rows = [
        df.select(
            F.lit(d).alias("depth"),
            _bucket(F.col(key_col), d, width).alias("bucket"),
        )
        for d in range(depth)
    ]
    unioned = rows[0]
    for r in rows[1:]:
        unioned = unioned.unionByName(r)
    return unioned.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over depths of the
    key's bucket counter. ``keys`` is small (broadcast)."""
    probes = None
    for d in range(depth):
        p = keys.select(
            F.col(key_col),
            F.lit(d).alias("depth"),
            _bucket(F.col(key_col), d, width).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    joined = sketch.join(F.broadcast(probes), ["depth", "bucket"])
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))
