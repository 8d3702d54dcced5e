"""File-stats manifest + manifest-driven pruned reads
(sources/manifest.py): correctness-never-changes + actually-prunes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.sources.manifest import (
    build_manifest,
    prune_files,
    pruned_read,
)
from geoestate_etl_spark.sources.parquet_io import write_sorted_table


@pytest.fixture(scope="module")
def sorted_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("manifest") / "orders_sorted")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    # range-partitioned + sorted by o_totalprice → disjoint per-file
    # envelopes, the layout a manifest prunes well
    (
        orders.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


@pytest.fixture(scope="module")
def random_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("manifest") / "orders_random")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    orders.repartition(8).write.mode("overwrite").parquet(d)
    return d


def test_pruned_read_equals_full_scan(spark, sorted_path):
    man = build_manifest(spark, sorted_path, ["o_totalprice"])
    pred = {"o_totalprice": (100_000.0, 150_000.0)}
    got = pruned_read(spark, sorted_path, man, pred)
    want = (
        spark.read.parquet(sorted_path)
        .filter(F.col("o_totalprice").between(100_000.0, 150_000.0))
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sorted_layout_prunes_most_files(spark, sorted_path):
    man = build_manifest(spark, sorted_path, ["o_totalprice"])
    n_total = man.select("file").distinct().count()
    kept = prune_files(man, {"o_totalprice": (100_000.0, 150_000.0)})
    # a narrow band over a range-partitioned layout touches few files
    assert n_total == 8
    assert 1 <= len(kept) <= 3, (len(kept), n_total)


def test_random_layout_prunes_nothing_but_stays_correct(spark, random_path):
    """On unclustered layout every file's envelope spans the domain:
    the manifest honestly keeps everything and results still match."""
    man = build_manifest(spark, random_path, ["o_totalprice"])
    kept = prune_files(man, {"o_totalprice": (100_000.0, 150_000.0)})
    assert len(kept) == man.select("file").distinct().count()
    got = pruned_read(
        spark, random_path, man, {"o_totalprice": (100_000.0, 150_000.0)}
    ).count()
    want = (
        spark.read.parquet(random_path)
        .filter(F.col("o_totalprice").between(100_000.0, 150_000.0))
        .count()
    )
    assert got == want


def test_empty_survivor_set(spark, sorted_path):
    man = build_manifest(spark, sorted_path, ["o_totalprice"])
    pred = {"o_totalprice": (-2.0, -1.0)}  # below domain
    assert prune_files(man, pred) == []
    out = pruned_read(spark, sorted_path, man, pred)
    assert out.count() == 0
    # schema preserved for downstream composition
    assert "o_orderkey" in out.columns


def test_multi_column_conjunction(spark, sorted_path):
    man = build_manifest(spark, sorted_path, ["o_totalprice", "o_custkey"])
    pred = {
        "o_totalprice": (100_000.0, 150_000.0),
        "o_custkey": (0.0, 400.0),
    }
    got = pruned_read(spark, sorted_path, man, pred)
    want = (
        spark.read.parquet(sorted_path)
        .filter(F.col("o_totalprice").between(100_000.0, 150_000.0))
        .filter(F.col("o_custkey").between(0, 400))
    )
    assert got.count() == want.count()
    # conjunction can only shrink the survivor set
    assert len(prune_files(man, pred)) <= len(
        prune_files(man, {"o_totalprice": (100_000.0, 150_000.0)})
    )


def test_string_stats_never_prune(spark, tmp_path_factory):
    """String-column footer stats are lexicographic (min='100' >
    max='99' over values 99..175); numeric pruning on them would drop
    matching files — the manifest records the physical type and
    excludes nothing for non-numeric columns (r4 review)."""
    d = str(tmp_path_factory.mktemp("manifest") / "strs")
    df = spark.createDataFrame(
        [("99",), ("100",), ("175",)], "sval string"
    ).coalesce(1)
    df.write.mode("overwrite").parquet(d)
    man = build_manifest(spark, d, ["sval"])
    assert man.filter(F.col("ptype") == "BYTE_ARRAY").count() > 0
    # envelope would be [100, 99] numerically — must NOT prune
    kept = prune_files(man, {"sval": (150.0, 200.0)})
    assert len(kept) == man.select("file").distinct().count() == 1


def test_hive_partitioned_base_path(spark, tmp_path_factory):
    """pruned_read must keep Hive partition columns visible when
    reading surviving leaf files directly (basePath; r4 review)."""
    d = str(tmp_path_factory.mktemp("manifest") / "hive")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    (
        orders.repartitionByRange(4, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(d)
    )
    man = build_manifest(spark, d, ["o_totalprice"])
    pred = {"o_totalprice": (100_000.0, 150_000.0)}
    got = pruned_read(spark, d, man, pred)
    assert "o_orderstatus" in got.columns
    want = (
        spark.read.parquet(d)
        .filter(F.col("o_totalprice").between(100_000.0, 150_000.0))
    )
    assert got.count() == want.count()
    assert got.select("o_orderstatus").distinct().count() == want.select(
        "o_orderstatus"
    ).distinct().count()


def test_missing_stats_column_is_conservative(spark, sorted_path):
    """Predicating on a column the manifest was NOT built for must
    exclude nothing (no information → keep all) while the known
    column still prunes — the subtractive contract."""
    man = build_manifest(spark, sorted_path, ["o_totalprice"])
    kept = prune_files(
        man,
        {"o_custkey": (0.0, 1.0), "o_totalprice": (100_000.0, 150_000.0)},
    )
    # unknown o_custkey removes no files; o_totalprice still prunes
    assert 1 <= len(kept) <= 3
    wide = prune_files(man, {"o_custkey": (0.0, 1.0)})
    assert len(wide) == 8


def test_append_manifest_incremental(spark, tmp_path_factory):
    """Epoch shape: new files stat'd once, existing rows kept verbatim,
    vanished files dropped, no-op append idempotent."""
    import os
    import shutil

    from geoestate_etl_spark.sources.manifest import append_manifest

    d = str(tmp_path_factory.mktemp("manifest") / "epochs")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    orders.limit(500).coalesce(1).write.mode("overwrite").parquet(d)
    man1 = build_manifest(spark, d, ["o_totalprice"])
    n1 = man1.select("file").distinct().count()

    # epoch 2 appends files
    orders.limit(300).coalesce(1).write.mode("append").parquet(d)
    man2 = append_manifest(spark, man1, d, ["o_totalprice"])
    n2 = man2.select("file").distinct().count()
    assert n2 == n1 + 1
    # existing rows identical to a fresh full build
    full = build_manifest(spark, d, ["o_totalprice"])
    assert man2.exceptAll(full).count() == 0
    assert full.exceptAll(man2).count() == 0

    # idempotent no-op
    man3 = append_manifest(spark, man2, d, ["o_totalprice"])
    assert man3.exceptAll(man2).count() == 0

    # vanished file rows dropped
    victim = sorted(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )[0]
    os.remove(os.path.join(d, victim))
    shutil.rmtree(os.path.join(d, "_spark_metadata"), ignore_errors=True)
    man4 = append_manifest(spark, man3, d, ["o_totalprice"])
    assert man4.select("file").distinct().count() == n2 - 1
