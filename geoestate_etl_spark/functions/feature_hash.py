"""Feature hashing (the hashing trick, Weinberger et al. 2009) for
categorical features at corpus scale.

One-hot encoding needs a fitted vocabulary (a corpus-wide distinct +
an id table join); the hashing trick needs NOTHING fitted: index =
hash(col_name=value) mod dims, sign = a second hash bit, collisions
cancel in expectation. That makes it the map-only, schema-stable
featurizer for 100 TB inputs — no shuffle, no model state, new
categories never break serving.

Everything here is pure Column expressions (xxhash64 + higher-order
fns, whole-stage codegen) producing a sparse vector as
``struct<indices array<int>, values array<double>>`` with strictly
increasing indices and same-index collisions summed — the layout a
downstream trainer or `cosine`-style fold consumes directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _idx_sign(token: Column, dims: int) -> Column:
    """struct(idx, sign) for one feature token: index from xxhash64
    mod dims (non-negative), sign from an independent salt's low bit."""
    h = F.xxhash64(token)
    idx = F.pmod(h, F.lit(dims)).cast("int")
    sign = F.when(
        F.xxhash64(token, F.lit("sign")).bitwiseAND(F.lit(1)) == 1,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    return F.struct(idx.alias("idx"), sign.alias("sign"))


def feature_hash(
    cols: dict[str, Column | str], dims: int = 1 << 18
) -> Column:
    """Hash the given named features of one row into a sparse vector.

    ``cols`` maps feature NAME → Column (the name is part of the hash
    input, so ``country=US`` and ``lang=US`` land independently).
    NULL feature values contribute nothing. Output indices are sorted
    strictly increasing with same-index contributions summed (signed
    ±1 per feature occurrence).
    """
    if dims <= 0 or dims > (1 << 31) - 1:
        raise ValueError(
            f"dims must be in [1, 2^31-1] (int index space), got {dims}"
        )
    if not cols:
        raise ValueError("feature_hash needs at least one feature column")
    toks = []
    for name, c in cols.items():
        col = F.col(c) if isinstance(c, str) else c
        token = F.concat(F.lit(f"{name}="), col.cast("string"))
        toks.append(
            F.when(col.isNull(), F.lit(None)).otherwise(_idx_sign(token, dims))
        )
    pairs = F.array_sort(
        F.filter(F.array(*toks), lambda s: s.isNotNull())
    )  # sorted by idx (then sign) — struct ordering is field-lexicographic

    # merge same-idx runs: fold into (indices, values) accumulators,
    # summing while the incoming idx equals the last emitted one
    acc0 = F.struct(
        F.array().cast("array<int>").alias("indices"),
        F.array().cast("array<double>").alias("values"),
    )

    def merge(acc: Column, s: Column) -> Column:
        last = F.element_at(acc["indices"], -1)
        same = (F.size(acc["indices"]) > 0) & (last == s["idx"])
        return F.when(
            same,
            F.struct(
                acc["indices"].alias("indices"),
                F.concat(
                    F.slice(acc["values"], 1, F.size(acc["values"]) - 1),
                    F.array(F.element_at(acc["values"], -1) + s["sign"]),
                ).alias("values"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["indices"], F.array(s["idx"])).alias("indices"),
                F.concat(acc["values"], F.array(s["sign"])).alias("values"),
            )
        )

    vec = F.aggregate(pairs, acc0, merge)
    # drop exact cancellations (summed value 0.0) to keep the vector
    # minimal and sign-collision-consistent
    return F.struct(
        F.filter(
            F.zip_with(
                vec["indices"], vec["values"], lambda i, v: F.when(v != 0.0, i)
            ),
            lambda x: x.isNotNull(),
        ).alias("indices"),
        F.filter(vec["values"], lambda v: v != 0.0).alias("values"),
    )


def sparse_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two sparse vectors in the (indices, values)
    layout — a sort-merge fold over the index arrays, in-row, JVM-side
    (the building block for hashed-feature cosine/logit scoring)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    merged = F.array_sort(
        F.concat(
            F.zip_with(a["indices"], a["values"], lambda i, v: F.struct(
                i.alias("idx"), v.alias("v"), F.lit(0).alias("side"))),
            F.zip_with(b["indices"], b["values"], lambda i, v: F.struct(
                i.alias("idx"), v.alias("v"), F.lit(1).alias("side"))),
        )
    )
    # adjacent equal-idx pairs from opposite sides multiply; sides are
    # internally strictly-increasing, so an equal-idx run is ≤2 long
    n = F.size(merged)
    idx_seq = F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0)))
    terms = F.when(
        n < 2, F.lit(0.0)
    ).otherwise(
        F.aggregate(
            idx_seq,
            F.lit(0.0),
            lambda acc, i: acc
            + F.when(
                (F.element_at(merged, i + 1)["idx"]
                 == F.element_at(merged, i + 2)["idx"])
                & (F.element_at(merged, i + 1)["side"]
                   != F.element_at(merged, i + 2)["side"]),
                F.element_at(merged, i + 1)["v"]
                * F.element_at(merged, i + 2)["v"],
            ).otherwise(F.lit(0.0)),
        )
    )
    return terms
