"""Transactional table formats (Delta Lake), probed at runtime.

ROADMAP #8 / r3 verdict #9: ``operators/merge.py`` emulates MERGE/SCD2
relationally over plain parquet because this container ships no format
jars. When a deployment DOES have them (delta-spark on the classpath),
the same upsert semantics should run as a real transactional
``MERGE INTO`` with time travel — this module is that conditional
wiring: probe once, real path when present, emulated fallback always
available. ``tests/test_table_formats.py`` runs the real path only
where the probe succeeds (skip otherwise), so whichever environment
has the jars gets the green conditional test.

Scale notes for the real path: Delta MERGE rewrites only the files
whose rows match (data skipping via file stats), and time travel reads
the transaction log — both strictly better than the emulated
read-modify-overwrite at 100 TB, which is why the probe prefers them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available(spark: SparkSession | None = None) -> bool:
    """True iff the Delta Lake runtime is importable, its classes are
    on the JVM classpath, AND the session was actually built with the
    Delta SQL extension + catalog conf (:func:`delta_session_conf`).
    The conf check matters: jars on the classpath with a plain session
    would select the real path only for DeltaTable/MERGE to throw
    'requires DeltaSparkSessionExtension' — the probe must answer
    "can THIS session run Delta", not "could some session" (r4 review
    finding). Cheap enough to call per-use; probing mutates nothing."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is None:
        return True
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        )
    except Exception:
        return False
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        cat = spark.conf.get("spark.sql.catalog.spark_catalog", "") or ""
    except Exception:
        return False
    return (
        "io.delta.sql.DeltaSparkSessionExtension" in ext
        and "DeltaCatalog" in cat
    )


def delta_session_conf() -> dict[str, str]:
    """Session conf enabling Delta's SQL surface — apply via
    ``get_spark(extra_conf=delta_session_conf())`` when the probe
    passes (harmless but useless without the jars)."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
) -> str:
    """Upsert ``updates`` into the table at ``target_path`` by key.

    Real path (Delta present): transactional ``MERGE INTO`` — matched
    rows update, unmatched insert, concurrent readers see the previous
    snapshot until commit. Fallback: the relational emulation
    (:func:`operators.merge.upsert`) + parquet overwrite — same final
    relation, no transactionality. Returns which path ran
    (``"delta"`` | ``"parquet"``) so callers/tests can assert on it.
    """
    if delta_available(spark):
        from delta.tables import DeltaTable

        dt = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
        (
            dt.alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return "delta"
    from geoestate_etl_spark.operators.merge import upsert

    target = spark.read.parquet(target_path)
    merged = upsert(target, updates, keys)
    # Write-then-swap (ADVICE r4): the merged frame lands in a temp
    # sibling FIRST, so the old files survive until the new write has
    # fully committed — a failure mid-write leaves the target intact.
    # The previous localCheckpoint+overwrite broke lineage through
    # executor-LOCAL, non-replicated blocks: on a real cluster, losing
    # an executor after the overwrite truncated the directory but
    # before completion lost the table (classic read-modify-overwrite).
    # os.replace/rename is atomic on POSIX; on object stores the swap
    # step would become the store's atomic rename/commit primitive.
    import shutil
    import uuid

    tmp_path = f"{target_path.rstrip('/')}__merge_tmp_{uuid.uuid4().hex[:8]}"
    old_path = f"{target_path.rstrip('/')}__merge_old_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp_path)
    os.replace(target_path.rstrip("/"), old_path)
    try:
        os.replace(tmp_path, target_path.rstrip("/"))
    except Exception:
        os.replace(old_path, target_path.rstrip("/"))  # roll back
        raise
    shutil.rmtree(old_path, ignore_errors=True)
    return "parquet"


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: Delta serves any committed version from the
    transaction log; plain parquet has exactly one version (0) — asking
    for history without a transactional format is an explicit error,
    not a silent latest-read."""
    if delta_available(spark):
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(path)
    if version not in (None, 0):
        raise ValueError(
            f"time travel to version {version} requires a transactional "
            "table format; plain parquet keeps no history"
        )
    return spark.read.parquet(path)


def write_table(spark: SparkSession, df: DataFrame, path: str) -> str:
    """Create/overwrite a managed-format table at ``path`` in the best
    available format. Returns the format used."""
    if delta_available(spark):
        df.write.format("delta").mode("overwrite").save(path)
        return "delta"
    df.write.mode("overwrite").parquet(path)
    return "parquet"
