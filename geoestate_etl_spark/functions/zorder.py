"""Z-order (Morton) interleaving for multi-dimensional data locality.

Sorting/clustering a table by the Morton key of (lat, lon) — or any
two bounded dimensions — makes parquet row-group min/max stats
selective for BOTH dimensions at once, so 2D range queries prune
row groups that a single-column sort cannot. This is the
write-layout companion to ``functions.geo.grid_cell``.

The bit-spreading uses the classic magic-number shifts — pure integer
Column arithmetic, identical semantics in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (shift, mask) pairs spreading 16 bits to even positions (32-bit result)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(c: Column) -> Column:
    x = c.cast(T.LongType()).bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key_2d(
    a: Column | str,
    b: Column | str,
    a_min: float,
    a_max: float,
    b_min: float,
    b_max: float,
    bits: int = 16,
) -> Column:
    """Interleaved Z-order key of two bounded doubles, ``bits`` bits
    of precision per axis (≤16). Values outside the bounds clamp."""
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    scale = (1 << bits) - 1

    def quantize(c: Column | str, lo: float, hi: float) -> Column:
        col = F.col(c) if isinstance(c, str) else c
        clamped = F.least(F.greatest(col, F.lit(lo)), F.lit(hi))
        return F.floor((clamped - lo) / (hi - lo) * scale).cast(T.LongType())

    qa = _spread_bits(quantize(a, a_min, a_max))
    qb = _spread_bits(quantize(b, b_min, b_max))
    return qa.bitwiseOR(F.shiftleft(qb, 1))
