"""Binary-file ingestion for multimodal corpora.

Spark's built-in ``binaryFile`` format (no extra jars) reads a
directory tree as one row per file: ``(path, modificationTime,
length, content: binary)`` — the natural entry point for the
image/audio/video columns the multimodal operators consume
(`operators/multimodal.py`): treat payloads as opaque bytes with
typed metadata, decode headers via Arrow-batched ``mapInPandas``.

Scale notes (100 TB of small media files is the hard case):

- ``pathGlobFilter`` applies during file LISTING, so non-matching
  files are never opened — push the extension filter here, not into a
  post-read ``filter``.
- Binary files are not splittable; Spark bin-packs whole files into
  tasks by ``spark.sql.files.maxPartitionBytes`` +
  ``spark.sql.files.openCostInBytes``. For millions of tiny files,
  raising openCostInBytes packs more files per task and cuts task
  overhead; the default 4 MiB open-cost is tuned for exactly this.
- The driver materializes the file LIST (an in-memory index of paths,
  not contents) — at extreme file counts, ingest from fewer, larger
  archive containers instead (the shard writer in ``sources/shards.py``
  is the inverse of this problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_binary_files", "media_table"]


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """One row per file: (path, modificationTime, length, content).

    ``glob`` is a file-listing-time filter (e.g. ``"*.png"``);
    ``recursive`` descends nested directory layouts (date-partitioned
    crawl dumps etc.).
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def media_table(files: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Normalize a binaryFile scan into the multimodal operators'
    input shape: ``(media_id, source_path, n_bytes, content)``.

    ``media_id`` is ``xxhash64(path)`` — deterministic across runs and
    cluster layouts (content-addressing by path, not by partition
    order), so downstream joins against decode/feature tables are
    stable as the corpus grows.
    """
    return files.select(
        F.xxhash64(F.col("path")).alias(id_col),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
        "content",
    )
