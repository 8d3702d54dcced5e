"""File-statistics manifest + manifest-driven pruned reads — the
Iceberg/Delta data-skipping pattern over plain parquet directories.

A manifest is a QUERYABLE relation ``(file, n_rows, col, vmin, vmax)``
built from parquet footer statistics. Scans with range predicates
consult the manifest first and plan the read over ONLY the files whose
[vmin, vmax] envelope intersects the predicate — at 100 TB the
difference between "open 80k footers to discover nothing matches" and
"read one manifest row-set, open 40 files".

Scale notes:

- ``build_manifest`` reads footers only (pyarrow) — bytes read are
  O(files), not O(data). The loop is driver-side for simplicity at
  test scale; at warehouse scale footers are listed once per ingest
  epoch and the manifest is appended incrementally (the same shape the
  epoch sinks in ``streaming/`` use), or the file list is distributed
  via ``spark.createDataFrame(files).mapInPandas`` — the relation and
  pruning logic below are identical either way.
- Pruning is conservative ONLY (a file survives unless its envelope
  provably misses): NULL stats (all-NULL pages, unsupported types)
  keep the file, and the actual predicate is re-applied after the
  read, so a stale or partial manifest can never change results —
  only how many files are opened. This mirrors how engines treat
  stats as an optimization, never a correctness input.
- Works UNDER any layout, but earns its keep on clustered layouts:
  ``write_sorted_table`` gives disjoint key ranges per file,
  ``write_zordered_table`` (functions/zorder.py) gives tight 2-D
  envelopes; on random layout every file intersects everything and
  the manifest honestly prunes nothing (pinned in tests).

Reference parity: the reference's ClickHouse MergeTree serving table
gets part-level min/max skipping from its ORDER BY key implicitly
(dags/main.py:113-129); this module is that capability for the
parquet-backed emulation, made explicit and composable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, dirs, files in os.walk(path):
        # mirror Spark's hidden-path filter: skip '_'/'.'-prefixed
        # files AND directories (_temporary trees from killed writers,
        # _delta_log, .crc shadows) — otherwise the manifest would
        # index files the full-scan baseline never reads (r4 review)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def build_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """``(file, n_rows, col, ptype, vmin, vmax)`` from parquet footers.

    Values are stringified (one manifest schema for any column type)
    with the parquet PHYSICAL TYPE recorded per row: pruning compares
    only rows whose physical type is numeric — string/binary stats are
    lexicographic, and casting them to DOUBLE would build a WRONG
    envelope (min="100" > max="99" for values 99..175) that prunes
    files containing matches (r4 review). Non-numeric rows are kept
    for inspection but never exclude a file.
    """
    return build_manifest_for_files(spark, _parquet_files(path), cols)


#: parquet physical types whose footer min/max order matches numeric
#: order — the only stats pruning may trust (BOOLEAN excluded: range
#: pruning on booleans is pointless; BYTE_ARRAY/FIXED excluded:
#: lexicographic)
_NUMERIC_PTYPES = ("INT32", "INT64", "FLOAT", "DOUBLE")


def append_manifest(
    spark: SparkSession,
    manifest: DataFrame,
    path: str,
    cols: list[str],
) -> DataFrame:
    """Incremental maintenance: stat only files NOT already in the
    manifest and append their rows — the per-epoch shape for streaming
    sinks (each epoch adds files; footers are read once per file ever,
    never re-walked). Removed files' rows are dropped so the manifest
    never plans a read of a vanished file.

    Idempotent: appending with no new files returns an equal relation.
    """
    known = {r.file for r in manifest.select("file").distinct().collect()}
    on_disk = _parquet_files(path)
    fresh = [f for f in on_disk if f not in known]
    still = [f for f in on_disk]
    kept = manifest.filter(F.col("file").isin(still))
    if not fresh:
        out = kept
    else:
        out = kept.unionByName(build_manifest_for_files(spark, fresh, cols))
    # eager checkpoint: the per-epoch call chain would otherwise nest
    # one filter+union per epoch and re-analyze the whole history each
    # call — the plan-growth trap docs/TUNING.md documents for BFS
    # loops (r4 review). The relation is file-count bounded, so
    # materializing it per epoch is cheap.
    return out.localCheckpoint(eager=True)


def build_manifest_for_files(
    spark: SparkSession, files: list[str], cols: list[str]
) -> DataFrame:
    """Footer-stats rows for an explicit file list (the unit
    :func:`build_manifest` and :func:`append_manifest` share)."""
    import pyarrow.parquet as pq

    rows = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {
            md.schema.column(j).name: j
            for j in range(md.num_columns)
            if md.schema.column(j).name in cols
        }
        ptypes = {c: md.schema.column(j).physical_type for c, j in idx.items()}
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        have: dict[str, bool] = {c: True for c in cols}
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for c, j in idx.items():
                st = rg.column(j).statistics
                if st is None or not st.has_min_max:
                    have[c] = False
                    continue
                mins[c] = st.min if c not in mins else min(mins[c], st.min)
                maxs[c] = st.max if c not in maxs else max(maxs[c], st.max)
        for c in cols:
            ok = have.get(c) and c in mins
            rows.append(
                (
                    f,
                    md.num_rows,
                    c,
                    ptypes.get(c),
                    str(mins[c]) if ok else None,
                    str(maxs[c]) if ok else None,
                )
            )
    return spark.createDataFrame(
        rows,
        "file string, n_rows long, col string, ptype string, "
        "vmin string, vmax string",
    )


def prune_files(
    manifest: DataFrame, predicates: dict[str, tuple[float, float]]
) -> list[str]:
    """Files whose stats envelopes intersect EVERY ``col: (lo, hi)``
    predicate (closed intervals). A file missing stats for a predicate
    column survives (conservative). Returns the surviving file list —
    driver-sized: one row per file, the whole point of a manifest."""
    all_files = manifest.select("file").distinct()
    if not predicates:
        return sorted(r.file for r in all_files.collect())
    # subtractive form: start from every file, remove only PROVABLE
    # misses — a predicate column with no manifest rows, NULL stats,
    # or a non-castable type excludes nothing (conservative by
    # construction, unlike an intersect of per-column keep-sets which
    # silently drops files for unknown columns)
    vmin = F.col("vmin").cast("double")
    vmax = F.col("vmax").cast("double")
    surviving = all_files
    for c, (lo, hi) in predicates.items():
        misses = (
            manifest.filter(F.col("col") == c)
            # lexicographic (string/binary) stats must never prune:
            # their min/max order is not numeric order (r4 review)
            .filter(F.col("ptype").isin(*_NUMERIC_PTYPES))
            .filter(
                vmin.isNotNull()
                & vmax.isNotNull()
                & ((vmax < F.lit(float(lo))) | (vmin > F.lit(float(hi))))
            )
            .select("file")
        )
        surviving = surviving.exceptAll(misses)
    return sorted(r.file for r in surviving.distinct().collect())


def pruned_read(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    predicates: dict[str, tuple[float, float]],
) -> DataFrame:
    """Manifest-planned scan: read only the surviving files, then
    RE-APPLY the predicate exactly — identical results to a full scan
    + filter by construction, fewer files opened. Returns an empty
    frame with the real schema when nothing survives."""
    files = prune_files(manifest, predicates)
    # basePath keeps Hive partition columns (year=.../) visible when
    # reading leaf files directly, matching the full-scan schema in
    # BOTH branches (r4 review)
    base = (
        spark.read.option("basePath", path).parquet(*files)
        if files
        else spark.read.parquet(path).limit(0)
    )
    out = base
    for c, (lo, hi) in predicates.items():
        out = out.filter(F.col(c).between(lo, hi))
    return out
