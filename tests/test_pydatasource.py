"""Custom Python DataSources (`sources/pydatasource.py`): batch read
with real filter pushdown, partitioning-invariant determinism,
streaming micro-batches with replayable offsets, and the jsonlsink
commit protocol."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.sources.pydatasource import (
    CorpusGenReader,
    gen_row,
    register_python_sources,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_python_sources(spark)


def _load(spark, **opts):
    r = spark.read.format("corpusgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_deterministic_across_partitionings(spark):
    a = sorted(map(tuple, _load(spark, n_rows=500, n_partitions=1).collect()))
    b = sorted(map(tuple, _load(spark, n_rows=500, n_partitions=13).collect()))
    assert a == b
    assert len(a) == 500
    # content matches the shared single-source generator row-for-row
    assert a[:3] == [gen_row(i, 42) for i in range(3)]


def test_filtered_read_matches_post_filter_semantics(spark):
    """Pushdown must be invisible to results: filtering the source
    equals filtering the full read."""
    full = _load(spark, n_rows=1000, n_partitions=7)
    cond = (F.col("doc_id") >= 100) & (F.col("doc_id") < 300) & (F.col("lang") == "en")
    want = sorted(map(tuple, full.filter(cond).collect()))
    got = sorted(
        map(tuple, _load(spark, n_rows=1000, n_partitions=7).filter(cond).collect())
    )
    assert got == want
    assert 0 < len(got) < 1000


def test_push_filters_narrow_generation(spark):
    """Direct unit contract: supported predicates are CONSUMED (id
    range narrowed, langs pruned), unsupported ones are yielded back
    for Spark to apply."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringContains,
    )

    r = CorpusGenReader({"n_rows": "1000", "n_partitions": "4"})
    rest = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 100),
                LessThan(("doc_id",), 260),
                EqualTo(("lang",), "de"),
                StringContains(("text",), "brick"),
            ]
        )
    )
    assert [type(f).__name__ for f in rest] == ["StringContains"]
    assert (r.lo, r.hi) == (100, 260)
    assert r.langs == {"de"}
    parts = r.partitions()
    assert parts[0].start == 100 and parts[-1].end == 260
    rows = [row for p in parts for row in r.read(p)]
    assert rows and all(row[1] == "de" for row in rows)
    assert {row[0] for row in rows} == {i for i in range(100, 260) if i % 5 == 1}


def test_stream_reader_batches_and_replay(spark, tmp_path):
    """The stream source delivers the id-watermark batches exactly
    once into a file sink, and the offset semantics replay
    deterministically (same rows for the same (start, end))."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("corpusgen")
        .option("rows_per_batch", 150)
        .option("max_rows", 600)
        .option("n_partitions", 3)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    # drain: latestOffset stops advancing at max_rows, so this returns
    # once all 4 micro-batches are in (PythonMicroBatchStream does not
    # support Trigger.AvailableNow in 4.1 — it degrades to one batch)
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == sorted(gen_row(i, 42) for i in range(600))

    from geoestate_etl_spark.sources.pydatasource import CorpusGenStreamReader

    r = CorpusGenStreamReader({"rows_per_batch": "10", "max_rows": "50"})
    batch1 = [
        row
        for p in r.partitions({"id": 10}, {"id": 30})
        for row in r.read(p)
    ]
    batch2 = [
        row
        for p in r.partitions({"id": 10}, {"id": 30})
        for row in r.read(p)
    ]
    assert batch1 == batch2 == [gen_row(i, 42) for i in range(10, 30)]


def test_jsonlsink_commit_protocol(spark, tmp_path):
    """Tasks write part files; commit publishes a _MANIFEST naming
    exactly the committed files with the exact row total."""
    path = str(tmp_path / "sink")
    df = _load(spark, n_rows=200, n_partitions=5)
    df.write.format("jsonlsink").option("path", path).mode("append").save()
    manifest = json.load(open(os.path.join(path, "_MANIFEST")))
    assert manifest["n_rows"] == 200
    listed = set(manifest["files"])
    on_disk = {f for f in os.listdir(path) if f.startswith("part-")}
    assert listed == on_disk
    rows = []
    for f in sorted(listed):
        with open(os.path.join(path, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 200
    assert sorted(r["doc_id"] for r in rows) == list(range(200))


def test_corpusgen_feeds_corpus_pipeline(spark):
    """Composition: the custom source is a drop-in corpus input — the
    full pipeline (gate → dedup tiers → scrub → pack) runs off a
    corpusgen read and accounts every generated row in its funnel."""
    from geoestate_etl_spark.plans.corpus_pipeline import run_corpus

    docs = (
        spark.read.format("corpusgen")
        .option("n_rows", 2000)
        .option("n_partitions", 8)
        .load()
    )
    res = run_corpus(docs, id_col="doc_id", text_col="text")
    try:
        assert res.n_input == 2000
        assert 0 < res.n_near_unique <= res.n_exact_unique <= res.n_gated <= 2000
        assert res.packed.count() > 0
    finally:
        res.unpersist()
