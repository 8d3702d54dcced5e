"""Drift gates for the disk-backed prepare artifacts (r6 — VERDICT r5
#3): the serving cold path reads spark-warehouse/prepared/<name>/<key>
parquet instead of re-running iterative prepare work per session. The
cache must be invisible to correctness: artifact content == a fresh
rebuild, keys rotate when sources change, invalidation works."""

from __future__ import annotations

import pytest

import os
import shutil

from pyspark.sql import functions as F

from geoestate_etl_spark.plans.prepared import (
    invalidate_artifact_key,
    invalidate_artifacts,
    prepared_frame,
    prepared_path,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(map(str, (tuple(r) for r in df.collect())))


def test_bfs_artifact_matches_fresh_rebuild(spark):
    from geoestate_etl_spark.operators.paths import bfs_distances
    from geoestate_etl_spark.plans.queries_ext import q_graph_bfs

    invalidate_artifact_key(SF_SMOKE, "bfs_supplier_order", ["lineitem"])
    r1 = _rows(q_graph_bfs(spark, SF_SMOKE))
    path = prepared_path(SF_SMOKE, "bfs_supplier_order", ["lineitem"], 1)
    assert os.path.exists(path)  # first call materialized the artifact
    assert _rows(q_graph_bfs(spark, SF_SMOKE)) == r1  # cached serve

    li = spark.read.parquet(os.path.join(SF_SMOKE, "lineitem.parquet"))
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_orderkey").cast("long") + 10_000_000).alias("dst"),
    ).distinct()
    fresh = bfs_distances(edges, source=0, max_hops=6)
    assert _rows(spark.read.parquet(path)) == _rows(fresh)


def test_pagerank_artifact_matches_fresh_rebuild(spark):
    from geoestate_etl_spark.operators.pagerank import pagerank
    from geoestate_etl_spark.plans.queries_ext import q_pagerank_suppliers

    invalidate_artifact_key(SF_SMOKE, "pagerank_supplier_nation", ["supplier"])
    r1 = _rows(q_pagerank_suppliers(spark, SF_SMOKE))
    path = prepared_path(SF_SMOKE, "pagerank_supplier_nation", ["supplier"], 1)
    assert os.path.exists(path)
    assert _rows(q_pagerank_suppliers(spark, SF_SMOKE)) == r1

    supp = spark.read.parquet(os.path.join(SF_SMOKE, "supplier.parquet"))
    edges = supp.select(
        F.col("s_suppkey").alias("src"),
        (F.col("s_nationkey").cast("long") + 1_000_000).alias("dst"),
    )
    # compare at the query's served rounding: raw pr is an FP quotient
    # sum whose last ulp may vary with partition order (ORACLE_NOTES)
    fresh = pagerank(edges, iters=6).select("id", F.round("pr", 6).alias("pr"))
    art = spark.read.parquet(path).select("id", F.round("pr", 6).alias("pr"))
    assert _rows(art) == _rows(fresh)


def test_text_gram_artifact_matches_fresh_rebuild(spark):
    from geoestate_etl_spark.functions.ngram_lm import ngram_logprob_micro
    from geoestate_etl_spark.operators.repetition import ngram_repetition
    from geoestate_etl_spark.plans.queries_suites import q_text_metrics

    invalidate_artifact_key(SF_SMOKE, "text_grams", ["documents"])
    r1 = _rows(q_text_metrics(spark, SF_SMOKE))
    assert _rows(q_text_metrics(spark, SF_SMOKE)) == r1

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    path = prepared_path(SF_SMOKE, "text_grams", ["documents"], 1)
    assert os.path.exists(path)
    merged = None
    for n in (2, 3):
        rep = ngram_repetition(docs, n).select(
            "doc_id",
            F.col("n_grams").alias(f"n_grams{n}"),
            F.col("top_gram").alias(f"top{n}_gram"),
            F.col("top_n").alias(f"top{n}_n"),
            F.col("dup_occ").alias(f"dup{n}"),
        )
        merged = rep if merged is None else merged.join(rep, "doc_id", "full")
    fresh = merged.join(
        ngram_logprob_micro(docs, None, "doc_id", "text", 3), "doc_id", "full"
    )
    assert _rows(spark.read.parquet(path)) == _rows(fresh)


def test_key_rotates_with_source_stats_and_version(spark, tmp_path):
    # a regenerated source table (different mtime) must get a new key
    sf2 = tmp_path / "sf"
    sf2.mkdir()
    src = "/root/testdata/sf0.001/region.parquet"
    dst = str(sf2 / "region.parquet")
    shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)
    p1 = prepared_path(str(sf2), "x", ["region"], 1)
    os.utime(dst, (1_000_000_000, 1_000_000_000))
    p2 = prepared_path(str(sf2), "x", ["region"], 1)
    assert p1 != p2
    # a bumped builder version must too
    assert prepared_path(str(sf2), "x", ["region"], 2) not in (p1, p2)

    # build → exists → invalidate removes the whole name
    df = prepared_frame(
        spark, str(sf2), "x", lambda: spark.range(5), sources=["region"]
    )
    assert df.count() == 5
    assert os.path.exists(prepared_path(str(sf2), "x", ["region"], 1))
    invalidate_artifacts("x")
    assert not os.path.exists(prepared_path(str(sf2), "x", ["region"], 1))


def test_build_race_loses_gracefully(spark, tmp_path, monkeypatch):
    """Two sessions racing the same build: the loser's os.rename hits
    an existing destination, discards its temp output, and serves the
    winner's (equivalent) artifact — no crash, no torn directory."""
    import geoestate_etl_spark.plans.prepared as P

    sf2 = tmp_path / "sf"
    sf2.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet", str(sf2 / "region.parquet"))
    path = prepared_path(str(sf2), "race", ["region"], 1)

    real_rename = os.rename
    calls = {"n": 0}

    def rename_with_race(src, dst):
        # the "other session" lands its artifact first, exactly once
        if dst == path and calls["n"] == 0:
            calls["n"] += 1
            spark.range(7).write.mode("overwrite").parquet(dst)
            raise OSError("destination exists")
        return real_rename(src, dst)

    monkeypatch.setattr(P.os, "rename", rename_with_race)
    df = prepared_frame(
        spark, str(sf2), "race", lambda: spark.range(7), sources=["region"]
    )
    assert df.count() == 7  # served the winner's artifact
    assert calls["n"] == 1
    # loser's temp directory was cleaned up
    leftovers = [d for d in os.listdir(os.path.dirname(path)) if ".tmp-" in d]
    assert leftovers == []
    # tmp_path sources get a fresh srcid per session: clean up so the
    # store doesn't accumulate one orphan key per pytest run
    invalidate_artifacts("race")


def test_failed_build_cleans_temp(spark, tmp_path):
    """ADVICE r6: a build() that raises must not strand its temp dir
    under the store forever (and two threaded builders must not share
    one pid-keyed temp name — covered by the uuid component)."""
    sf2 = tmp_path / "sf"
    sf2.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet", str(sf2 / "region.parquet"))
    path = prepared_path(str(sf2), "boom", ["region"], 1)

    def bad_build():
        raise RuntimeError("builder exploded")

    try:
        prepared_frame(spark, str(sf2), "boom", bad_build, sources=["region"])
        raise AssertionError("build error must propagate")
    except RuntimeError:
        pass
    parent = os.path.dirname(path)
    assert not os.path.exists(path)
    assert not os.path.exists(parent) or all(
        ".tmp-" not in d for d in os.listdir(parent)
    )


def test_mtime_ns_resolution_in_key(tmp_path):
    """ADVICE r6: whole-second st_mtime let a same-second, same-size
    regeneration silently serve a stale artifact; the key must use
    nanosecond mtime."""
    sf2 = tmp_path / "sf"
    sf2.mkdir()
    dst = str(sf2 / "region.parquet")
    shutil.copy("/root/testdata/sf0.001/region.parquet", dst)
    os.utime(dst, ns=(1_000_000_000_000_000_000, 1_000_000_000_000_000_000))
    p1 = prepared_path(str(sf2), "x", ["region"], 1)
    # same size, same whole second, +1 nanosecond
    os.utime(dst, ns=(1_000_000_000_000_000_000, 1_000_000_000_000_000_001))
    p2 = prepared_path(str(sf2), "x", ["region"], 1)
    assert p1 != p2


def test_gc_superseded_keys(spark, tmp_path):
    """VERDICT r6 #2: a regenerated source must leave exactly ONE live
    key per (name, source identity); artifacts for a DIFFERENT source
    identity (another sf dir) and in-flight .tmp- dirs survive."""
    sf_a = tmp_path / "sfa"
    sf_b = tmp_path / "sfb"
    for d in (sf_a, sf_b):
        d.mkdir()
        shutil.copy(
            "/root/testdata/sf0.001/region.parquet", str(d / "region.parquet")
        )

    invalidate_artifacts("gcdemo")
    prepared_frame(spark, str(sf_a), "gcdemo", lambda: spark.range(3), ["region"])
    prepared_frame(spark, str(sf_b), "gcdemo", lambda: spark.range(4), ["region"])
    parent = os.path.dirname(prepared_path(str(sf_a), "gcdemo", ["region"], 1))
    live = [d for d in os.listdir(parent) if ".tmp-" not in d]
    assert len(live) == 2  # two source identities coexist

    # fake an in-flight build + a legacy pre-r7 key
    os.makedirs(os.path.join(parent, "deadbeef-cafe.tmp-999-abc"), exist_ok=True)
    os.makedirs(os.path.join(parent, "0123456789abcdef"), exist_ok=True)

    old_a_key = os.path.basename(prepared_path(str(sf_a), "gcdemo", ["region"], 1))

    # regenerate source A → new statskey
    dst = str(sf_a / "region.parquet")
    st = os.stat(dst)
    os.utime(dst, ns=(st.st_mtime_ns + 1_000_000, st.st_mtime_ns + 1_000_000))

    # ADVICE r7 (+ r8 review): a just-superseded key must survive one
    # build with a full grace window measured FROM SUPERSESSION — a
    # concurrent session's lazily-evaluated plan may still pin its
    # files no matter how old the key's BUILD is. Mechanism: the first
    # GC pass drops a _SUPERSEDED tombstone instead of deleting.
    df = prepared_frame(
        spark, str(sf_a), "gcdemo", lambda: spark.range(5), ["region"]
    )
    assert df.count() == 5
    assert old_a_key in os.listdir(parent)  # tombstoned, not deleted
    assert os.path.exists(os.path.join(parent, old_a_key, "_SUPERSEDED"))

    # age the TOMBSTONES past the grace window, rebuild the key dir to
    # trigger GC again (delete the new key so the build re-runs), then
    # assert the aged keys are reaped
    import time as _time

    from geoestate_etl_spark.plans.prepared import GC_GRACE_SECONDS

    aged = _time.time() - GC_GRACE_SECONDS - 60
    os.utime(os.path.join(parent, old_a_key, "_SUPERSEDED"), (aged, aged))
    # legacy key gets its tombstone on the NEXT pass; plant it aged
    with open(os.path.join(parent, "0123456789abcdef", "_SUPERSEDED"), "w") as fh:
        fh.write("0")
    os.utime(os.path.join(parent, "0123456789abcdef", "_SUPERSEDED"), (aged, aged))
    a_key = os.path.basename(prepared_path(str(sf_a), "gcdemo", ["region"], 1))
    shutil.rmtree(os.path.join(parent, a_key))
    df = prepared_frame(
        spark, str(sf_a), "gcdemo", lambda: spark.range(5), ["region"]
    )
    assert df.count() == 5
    names = os.listdir(parent)
    live = [d for d in names if ".tmp-" not in d]
    b_key = os.path.basename(prepared_path(str(sf_b), "gcdemo", ["region"], 1))
    assert sorted(live) == sorted({a_key, b_key})  # exactly one per identity
    assert "deadbeef-cafe.tmp-999-abc" in names  # in-flight build untouched
    assert "0123456789abcdef" not in names  # legacy key swept
    # the A artifact now serves the REBUILT content
    assert spark.read.parquet(os.path.join(parent, a_key)).count() == 5
    invalidate_artifacts("gcdemo")


@pytest.mark.slow  # r10 verify-window tier (spawns a second JVM; race logic also covered by same-process test)
def test_two_process_race_builds_once_serves_both(tmp_path):
    """VERDICT r6 #4: TRUE two-process race — two fresh python
    processes, same warehouse, same key, concurrent prepared_frame.
    Both must serve the correct content, exactly one live artifact
    must remain, and no reader may ever observe a partial artifact
    (atomic rename is the mechanism; the loser discards its temp)."""
    import subprocess
    import sys

    sf2 = tmp_path / "sf"
    sf2.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet", str(sf2 / "region.parquet"))
    invalidate_artifacts("tworace")

    prog = r"""
import sys
from pyspark.sql import SparkSession
from geoestate_etl_spark.plans.prepared import prepared_frame
sf = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .appName("race-" + sys.argv[2])
    .getOrCreate()
)
df = prepared_frame(
    spark, sf, "tworace",
    lambda: spark.range(11).selectExpr("id", "id * 2 as dbl"),
    sources=["region"],
)
rows = sorted((r.id, r.dbl) for r in df.collect())
assert rows == [(i, 2 * i) for i in range(11)], rows
print("RACE_OK")
spark.stop()
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog, str(sf2), tag],
            cwd="/root/repo",
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for tag in ("a", "b")
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"stdout={out[-2000:]}\nstderr={err[-2000:]}"
        assert "RACE_OK" in out
    path = prepared_path(str(sf2), "tworace", ["region"], 1)
    parent = os.path.dirname(path)
    entries = os.listdir(parent)
    assert [d for d in entries if ".tmp-" in d] == []  # no stranded temps
    assert entries == [os.path.basename(path)]  # exactly one live key
    invalidate_artifacts("tworace")
