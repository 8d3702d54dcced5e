"""Point-in-time (temporal) join: facts against a versioned dimension.

The read-side companion of ``merge.scd2_apply``: given a dimension
with [valid_from, valid_to) versions, attach to each fact row the
version that was current at the fact's timestamp — the correctness
primitive for ML feature assembly (no leakage from the future) and
for reproducing reports as-of a date.

Formulation: equi-join on the key, then the interval filter. Catalyst
executes key-join + filter as one hash/sort-merge join with the
interval predicate as a join residual — shuffle on the key only.
For dimensions with MANY versions per key, pre-bucket by (key,
time-bucket) like the range join; for typical SCD2 cardinalities
(a handful of versions per key) the residual filter is the right
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Attach the dimension version current at ``facts[fact_ts]``.

    Open-ended current versions have ``valid_to`` NULL. With
    ``how='left'``, facts before the key's first version (or with no
    key match) keep NULL dimension columns.
    """
    shared = (set(facts.columns) & set(dim.columns)) - {key}
    if shared:
        raise ValueError(
            f"facts and dim share non-key columns {sorted(shared)}; the "
            "interval predicate and output would be ambiguous — rename "
            "them on one side first"
        )
    interval = (dim[valid_from] <= facts[fact_ts]) & (
        dim[valid_to].isNull() | (facts[fact_ts] < dim[valid_to])
    )
    return facts.join(dim, on=[facts[key] == dim[key], interval], how=how).drop(
        dim[key]
    )
