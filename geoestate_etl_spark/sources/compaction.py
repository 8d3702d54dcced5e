"""Small-file compaction — table maintenance for long-lived corpora.

Every incremental writer in this engine (epoch-keyed streaming ingest,
per-batch shard appends, partitioned serving writes) accretes files;
at 100 TB the failure mode is millions of small files: scan planning
cost grows with the file COUNT (listing + footer reads), task
bin-packing degrades, and the NameNode/object-store metadata becomes
the bottleneck long before the bytes do. The fix is periodic
compaction: rewrite a table's data into ~target-size files, keeping
content — and optionally clustering — identical.

Design choices (vs. a naive ``coalesce().write``):

- File sizing is computed from the table's OWN on-disk bytes (Hadoop
  FileSystem listing — works for any scheme Spark can read), so the
  output lands near the target regardless of compression ratio;
  ``coalesce(n)`` with a guessed n produces unpredictable sizes and
  skewed tasks (coalesce merges whole input partitions without a
  shuffle, so it inherits input skew).
- ``repartition(n)`` (round-robin) for even file sizes, or
  ``repartitionByRange + sortWithinPartitions`` when ``cluster_by``
  is given — a compaction that silently destroys the sort/cluster
  layout also destroys row-group pruning (`functions/zorder.py`), so
  clustering is explicit, never incidental.
- Output always goes to a NEW directory: Spark cannot overwrite a
  path it is lazily reading from, and compacting a live table in
  place while readers hold the old listing is an operational call
  (write → verify → swap) the caller must orchestrate, not a default.
- Hive-partitioned layouts (``epoch=N``, ``cell=N`` — the engine's
  own standing tables) keep their layout via ``partition_by``; a bare
  rewrite would flatten the partition column into the data files and
  break both partition discovery and pruning for downstream readers.

The reference has no maintenance surface (its ClickHouse MergeTree
compacts itself, ``dags/main.py:113-129``); this module is that
capability for the parquet/ORC serving layer (SURVEY §2 extensions).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class FileStats:
    n_files: int
    total_bytes: int
    min_bytes: int
    max_bytes: int

    @property
    def avg_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def file_stats(spark: SparkSession, path: str) -> FileStats:
    """Data-file census of a table directory (recursive; metadata files
    like ``_SUCCESS``/checksums excluded — the same visibility rule
    Spark's own scan listing applies)."""
    sizes = [sz for _, sz in _data_files(spark, path)]
    if not sizes:
        return FileStats(0, 0, 0, 0)
    return FileStats(len(sizes), sum(sizes), min(sizes), max(sizes))


def _data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)  # recursive
    out: list[tuple[str, int]] = []
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((f.getPath().toString(), f.getLen()))
    return out


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
    cluster_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` into ``out_path`` as ~``target_file_bytes``
    files. Returns the before/after census plus the partition count
    used (the audit record a maintenance job logs).

    With ``cluster_by``, output files are range-partitioned and sorted
    on those columns — each file owns a disjoint key range, so footer
    min/max pruning survives the rewrite (and improves, since ranges
    no longer overlap across the old small files).

    ``partition_by`` re-applies a Hive partition layout on write
    (``epoch``/``cell``/date columns). Required when compacting a
    partitioned table whose readers rely on the directory layout —
    without it the partition column is flattened into the data files
    (review finding). ``n_partitions`` then sizes files WITHIN the
    shuffle, and actual file count is per-directory.
    """
    before = file_stats(spark, path)
    n_out = max(1, math.ceil(before.total_bytes / target_file_bytes))
    df = spark.read.format(fmt).load(path)
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.repartition(n_out)
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(out_path)
    after = file_stats(spark, out_path)
    return {
        "n_files_before": before.n_files,
        "n_files_after": after.n_files,
        "total_bytes_before": before.total_bytes,
        "total_bytes_after": after.total_bytes,
        "n_partitions": n_out,
        "target_file_bytes": target_file_bytes,
    }
