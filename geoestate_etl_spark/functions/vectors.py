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


def quantize_int8(c: Column | str, id_safe: bool = True) -> Column:
    """Symmetric per-vector int8 quantization: struct(scale, q) with
    ``q[i] = round(x[i] / scale)`` for ``scale = max|x| / 127``.

    4× smaller than float32 at rest and on the wire — at corpus scale
    that is the difference between an ANN candidate scan that is
    IO-bound and one that fits in the page cache. Cosine similarity is
    scale-invariant, so ranking error comes only from rounding
    (≤ 1/254 per coordinate); recall parity is pinned in tests.
    All-zero vectors get scale 0 and all-zero codes.
    """
    x = to_double_array(c)
    mx = F.aggregate(x, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v)))
    scale = mx / F.lit(127.0)
    q = F.when(mx == 0, F.transform(x, lambda v: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(x, lambda v: F.round(v / scale).cast("tinyint"))
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qc: Column | str) -> Column:
    """Inverse of :func:`quantize_int8` (array<double>)."""
    s = _c(qc)
    return F.transform(s.getField("q"), lambda v: v.cast(T.DoubleType()) * s.getField("scale"))


def cosine_int8(a: Column | str, b: Column | str) -> Column:
    """Cosine over two int8-quantized structs. The per-vector scales
    cancel (cosine is scale-invariant), so the arithmetic runs on the
    small integer codes cast to double — no dequantize pass."""
    qa, qb = _c(a).getField("q"), _c(b).getField("q")
    return cosine(
        F.transform(qa, lambda v: v.cast(T.DoubleType())),
        F.transform(qb, lambda v: v.cast(T.DoubleType())),
    )


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


def projection_matrix(
    out_dim: int, in_dim: int, seed: int = 42
) -> list[list[float]]:
    """Deterministic sign random-projection matrix, rows scaled by
    1/sqrt(out_dim).

    Johnson-Lindenstrauss with ±1 entries (Achlioptas 2003,
    "Database-friendly random projections"): sign matrices carry the
    same distance-preservation guarantee as Gaussian ones, and the
    scaled-sign literals keep the per-dim arithmetic to one add/sub.
    Same stateless LCG scheme as ``similarity.make_hyperplanes`` —
    the matrix is a pure function of (seed, shape), identical on
    every executor and every run, so projected vectors are join-stable
    across pipelines without shipping matrix state anywhere.
    """
    import math

    s = 1.0 / math.sqrt(out_dim)
    rows = []
    for j in range(out_dim):
        row = []
        x = (seed * 6364136223846793005 + (j + 1) * 2862933555777941757) % (1 << 64)
        for _ in range(in_dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(s if (x >> 63) else -s)
        rows.append(row)
    return rows


def project(c: Column | str, matrix: list[list[float]]) -> Column:
    """Project an embedding onto ``matrix`` rows: ``array<double>`` of
    ``out_dim`` dots. Pure higher-order-function Columns (JVM-side);
    intended for modest out_dim (8-64) where the codegen tree stays
    small — the standard ANN pre-filter shape: project 768→32, bucket
    or index in the cheap space, exact-rescore survivors in the
    original space (see ``operators.similarity``)."""
    return F.array(
        *[dot(c, F.array(*[F.lit(v) for v in row])) for row in matrix]
    )
