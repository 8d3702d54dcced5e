"""Snapshot diffing: what changed between two versions of a table.

The audit primitive behind regression-checking a pipeline rewrite
("same input, is the output byte-stable?"), validating a backfill, or
publishing a change feed from full snapshots (poor-man's CDC when the
source offers no log). Row identity comes from ``key_cols``; change
detection hashes the non-key columns once per side — one full outer
join on the key, no per-column joins, no window functions.

NULL-safe throughout: key equality uses the join's null-safe
semantics only through concrete keys (NULL keys are reported
separately rather than silently matching nothing), and value
comparison hashes ``coalesce``-tagged strings so NULL→value and
value→NULL both count as changes.

``schema_diff`` is the structural sibling — added/removed/retyped
columns — and runs on metadata only (no jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff", "schema_diff"]


def _row_hash(df: DataFrame, cols: list[str]) -> F.Column:
    # tag each value with its column position and NULL-ness so
    # ("a", NULL) and (NULL, "a") hash differently
    parts = [
        F.concat(
            F.lit(f"{i}:"),
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")),
        )
        for i, c in enumerate(cols)
    ]
    return F.xxhash64(*parts)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """``(key_cols…, change)`` with ``change ∈ added | removed |
    changed`` — unchanged rows are filtered out BEFORE the driver sees
    anything, so the result is bounded by the churn, not the table.

    ``compare_cols`` defaults to the shared non-key columns. Rows with
    a NULL key on either side are tagged ``null_key_old`` /
    ``null_key_new`` instead of being silently dropped by the join.
    """
    shared = set(old.columns) & set(new.columns)
    cols = compare_cols or sorted(
        c for c in shared if c not in set(key_cols)
    )
    null_key = None
    for k in key_cols:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)

    o = old.filter(~null_key).select(
        *key_cols, _row_hash(old, cols).alias("_oh")
    )
    n = new.filter(~null_key).select(
        *key_cols, _row_hash(new, cols).alias("_nh")
    )
    joined = o.join(n, key_cols, "full_outer")
    diff = joined.filter(
        F.col("_oh").isNull()
        | F.col("_nh").isNull()
        | (F.col("_oh") != F.col("_nh"))
    ).select(
        *key_cols,
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )
    nulls = (
        old.filter(null_key)
        .select(*key_cols, F.lit("null_key_old").alias("change"))
        .unionByName(
            new.filter(null_key).select(
                *key_cols, F.lit("null_key_new").alias("change")
            )
        )
    )
    return diff.unionByName(nulls)


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Structural changes, metadata only: list of
    ``{"column", "change": added|removed|retyped, "old_type", "new_type"}``."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            out.append(
                {"column": c, "change": "removed", "old_type": o[c], "new_type": None}
            )
        elif c not in o:
            out.append(
                {"column": c, "change": "added", "old_type": None, "new_type": n[c]}
            )
        elif o[c] != n[c]:
            out.append(
                {"column": c, "change": "retyped", "old_type": o[c], "new_type": n[c]}
            )
    return out
