"""Deletion propagation: the forgotten document must disappear from
the served corpus AND stop being remembered by the standing state —
its fingerprint no longer blocks a re-submission, its signature no
longer shadows future twins — while untouched epochs' files are never
rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from geoestate_etl_spark.streaming.corpus_ingest import ingest_batch
from geoestate_etl_spark.streaming.forget import forget_documents
from tests.test_corpus_pipeline import GOOD, OTHER


def _dirs(tmp_path):
    return (
        str(tmp_path / "corpus"), str(tmp_path / "fps"), str(tmp_path / "sigs")
    )


def _ingest(spark, rows, epoch, corpus, fps, sigs):
    b = spark.createDataFrame(rows, ["doc_id", "text"])
    ingest_batch(b, epoch, corpus, fps, gate=F.lit(True), sig_dir=sigs)


def test_forget_propagates_and_unblocks(spark, tmp_path):
    corpus, fps, sigs = _dirs(tmp_path)
    _ingest(spark, [(1, GOOD), (2, OTHER)], 0, corpus, fps, sigs)
    _ingest(
        spark,
        [(3, "an entirely different third document about spark shuffles "
             "and partition pruning with plenty of distinct words")],
        1, corpus, fps, sigs,
    )

    ids = spark.createDataFrame([(1,)], "doc_id long")
    audit = forget_documents(spark, ids, corpus, fps, sigs)
    assert audit == {
        "n_docs_deleted": 1,
        "n_epochs_rewritten": 1,
        "n_fps_removed": 1,
        "n_sigs_removed": 1,
    }
    left = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert left == {2, 3}

    # the epoch-1 files were never rewritten (partition pruning)
    e1_mtime = max(
        os.path.getmtime(os.path.join(f"{corpus}/epoch=1", f))
        for f in os.listdir(f"{corpus}/epoch=1")
        if f.endswith(".parquet")
    )

    # a re-crawl of the SAME content is admitted fresh: the engine no
    # longer remembers even the hash
    _ingest(spark, [(9, GOOD)], 2, corpus, fps, sigs)
    now = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert 9 in now
    assert max(
        os.path.getmtime(os.path.join(f"{corpus}/epoch=1", f))
        for f in os.listdir(f"{corpus}/epoch=1")
        if f.endswith(".parquet")
    ) == e1_mtime


def test_forget_unknown_ids_noop(spark, tmp_path):
    corpus, fps, sigs = _dirs(tmp_path)
    _ingest(spark, [(1, GOOD)], 0, corpus, fps, sigs)
    audit = forget_documents(
        spark, spark.createDataFrame([(42,)], "doc_id long"), corpus, fps, sigs
    )
    assert audit["n_docs_deleted"] == 0 and audit["n_epochs_rewritten"] == 0
    assert spark.read.parquet(corpus).count() == 1


def test_forget_survives_missing_optin_epochs(spark, tmp_path):
    """sig_dir is opt-in per ingest run: forgetting a doc from an
    epoch ingested WITHOUT signatures must not crash on the missing
    sig partition (review finding) — it just removes nothing there."""
    corpus, fps, sigs = _dirs(tmp_path)
    b0 = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    ingest_batch(b0, 0, corpus, fps, gate=F.lit(True))  # no sig_dir
    _ingest(spark, [(2, OTHER)], 1, corpus, fps, sigs)

    audit = forget_documents(
        spark, spark.createDataFrame([(1,)], "doc_id long"), corpus, fps, sigs
    )
    assert audit["n_docs_deleted"] == 1 and audit["n_sigs_removed"] == 0
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == {2}
