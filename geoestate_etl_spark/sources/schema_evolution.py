"""Schema-evolution tolerant reads: one relation over epochs written
with DIFFERENT schemas (columns added/dropped/re-typed across ingest
generations) — the read-side contract that lets a long-lived corpus
directory evolve without rewriting history.

``read_conformed`` = parquet ``mergeSchema`` read (footer-union of all
schemas seen) conformed to an explicit TARGET schema:

- a column missing from old epochs surfaces as its declared DEFAULT
  (never bare NULL unless the default IS null — downstream gates
  shouldn't need per-column null-coalescing);
- a column dropped from the target is pruned (and with column
  pruning, never read off disk for the epochs that have it);
- a re-typed column is cast to the target type (ANSI-safe ``try_cast``
  semantics via ``cast`` on compatible widenings; incompatible values
  surface as NULL→default rather than a job-killing error);
- column ORDER is the target's — stable for positional consumers.

Scale notes: ``mergeSchema`` costs one footer read per FILE at plan
time (Spark samples by default; forced on here because correctness of
the union schema is the point) — at warehouse scale prefer carrying
the authoritative target schema from the catalog (this function takes
it explicitly for exactly that reason) and let per-epoch manifests
(``sources/manifest.py``) bound which directories are even listed.

Reference parity: the reference pins one hand-written schema forever
(dags/main.py:179-194); evolution handling is engine-declared surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_conformed(
    spark: SparkSession,
    path: str,
    target: T.StructType,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Read ``path`` (all epochs, union schema) conformed to
    ``target``: missing columns filled with ``defaults`` (or NULL),
    extra columns pruned, types cast, target column order."""
    raw = spark.read.option("mergeSchema", "true").parquet(path)
    return conform(raw, target, defaults)


def conform(
    df: DataFrame,
    target: T.StructType,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """The pure-relation half of :func:`read_conformed` (composable
    onto any source, e.g. a manifest-pruned read)."""
    defaults = defaults or {}
    have = {f.name for f in df.schema.fields}
    cols: list[Column] = []
    for field in target.fields:
        if field.name in have:
            # try_cast, not cast: under ANSI (Spark 4 default) a bad
            # value in one legacy epoch would kill the whole read —
            # the evolution contract is value→default, never error
            c = F.col(field.name).try_cast(field.dataType)
            if field.name in defaults:
                c = F.coalesce(
                    c, F.lit(defaults[field.name]).cast(field.dataType)
                )
            cols.append(c.alias(field.name))
        else:
            cols.append(
                F.lit(defaults.get(field.name)).cast(field.dataType).alias(
                    field.name
                )
            )
    return df.select(*cols)
