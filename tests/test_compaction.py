"""Small-file compaction (sources/compaction.py): file census, target
sizing from on-disk bytes, content preservation, cluster-by layout."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from geoestate_etl_spark.sources.compaction import compact_table, file_stats


def _checksum(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]


def _write_fragmented(spark, path, n_rows=50_000, n_files=64):
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha1(F.col("id").cast("string")).alias("payload")
    )
    df.repartition(n_files).write.parquet(path)
    return df


def test_file_stats_counts_data_files_only(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_fragmented(spark, p, n_rows=10_000, n_files=16)
    st = file_stats(spark, p)
    assert st.n_files == 16  # _SUCCESS and .crc files excluded
    assert st.total_bytes > 0 and st.min_bytes > 0
    assert st.max_bytes >= st.avg_bytes >= st.min_bytes


def test_compact_hits_target_and_preserves_content(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_fragmented(spark, src)
    before = file_stats(spark, src)
    # target ~= quarter of the table -> expect ~4 output files
    target = before.total_bytes // 4
    report = compact_table(spark, src, dst, target_file_bytes=target)
    assert report["n_files_before"] == 64
    assert report["n_partitions"] in (4, 5)  # ceil of bytes ratio
    assert report["n_files_after"] == report["n_partitions"]
    assert _checksum(spark.read.parquet(src)) == _checksum(spark.read.parquet(dst))
    # round-robin repartition -> files are near-even
    st = file_stats(spark, dst)
    assert st.max_bytes < 2 * st.min_bytes


def test_compact_cluster_by_gives_disjoint_file_ranges(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_fragmented(spark, src)
    before = file_stats(spark, src)
    compact_table(
        spark, src, dst,
        target_file_bytes=before.total_bytes // 4, cluster_by=["id"],
    )
    assert _checksum(spark.read.parquet(src)) == _checksum(spark.read.parquet(dst))
    # every output file owns a disjoint id range (footer-pruning layout)
    ranges = []
    for f, _sz in ((p, s) for p, s in _files(spark, dst)):
        md = pq.read_metadata(f.replace("file:", ""))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # id is column 0
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # no overlap between consecutive files


def _files(spark, path):
    from geoestate_etl_spark.sources.compaction import _data_files

    return _data_files(spark, path)


def test_partition_by_preserves_hive_layout(spark, tmp_path):
    """Compacting an epoch-partitioned table must keep epoch=N dirs
    (review finding: a bare rewrite flattens the partition column)."""
    import os

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 3).alias("epoch")
    )
    df.repartition(8).write.partitionBy("epoch").parquet(src)
    compact_table(
        spark, src, dst, target_file_bytes=1 << 20, partition_by=["epoch"]
    )
    assert sorted(
        d for d in os.listdir(dst) if d.startswith("epoch=")
    ) == ["epoch=0", "epoch=1", "epoch=2"]
    assert _checksum(spark.read.parquet(src)) == _checksum(spark.read.parquet(dst))
