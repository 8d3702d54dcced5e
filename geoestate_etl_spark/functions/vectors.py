"""Vector math over ``array<float>`` embedding columns.

Built entirely on Spark higher-order functions (``zip_with`` /
``aggregate`` / ``transform``) — evaluated JVM-side per row, no Python
in the loop, so similarity scans stay at columnar speed. Floats are
cast to double before arithmetic so results match a double-precision
oracle bit-for-bit given the same left-to-right summation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_double_array(c: Column | str) -> Column:
    return F.transform(_c(c), lambda x: x.cast(T.DoubleType()))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a[i]·b[i] — left-to-right fold, double precision."""
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0 when either vector is all-zero."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def hyperplane_bits(c: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit string of dots with fixed hyperplanes (LSH bucketing).

    ``planes`` are deterministic literals (see
    ``operators.similarity.make_hyperplanes``); output is a compact
    '0'/'1' string usable as an equi-join bucket key.
    """
    bits = [
        F.when(dot(c, F.array(*[F.lit(v) for v in p])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)
