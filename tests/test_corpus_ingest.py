"""Streaming corpus ingest: cross-batch fingerprint dedup, PII scrub,
epoch-keyed idempotence (retry == no-op), and the readStream wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.streaming.corpus_ingest import (
    ingest_batch,
    start_corpus_ingest,
)
from tests.test_corpus_pipeline import GOOD, OTHER, PII_DOC


def _read(spark, d):
    return spark.read.parquet(d)


def test_batch_twin_dedups_across_epochs_and_retries(spark, tmp_path):
    corpus, fps = str(tmp_path / "corpus"), str(tmp_path / "fps")

    b0 = spark.createDataFrame(
        [(1, GOOD), (2, "hi"), (3, PII_DOC)], ["doc_id", "text"]
    )
    b1 = spark.createDataFrame(
        [(4, GOOD), (5, OTHER)], ["doc_id", "text"]  # 4 = cross-epoch dup
    )
    b2 = spark.createDataFrame(
        [(6, "  " + OTHER), (7, GOOD.upper().lower()), (8, GOOD + " until dawn")],
        ["doc_id", "text"],  # 6,7 dups after normalization; 8 new
    )
    for i, b in enumerate((b0, b1, b2)):
        ingest_batch(b, i, corpus, fps)

    rows = {r.doc_id: r.text for r in _read(spark, corpus).collect()}
    assert set(rows) == {1, 3, 5, 8}
    assert "alice@example.com" not in rows[3] and "<EMAIL>" in rows[3]
    assert _read(spark, fps).select("fp").distinct().count() == 4

    # retry of epoch 1 with identical input must change nothing
    before = sorted(map(str, _read(spark, corpus).collect()))
    ingest_batch(b1, 1, corpus, fps)
    after = sorted(map(str, _read(spark, corpus).collect()))
    assert before == after


def test_stream_wiring_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus, fps = str(tmp_path / "corpus"), str(tmp_path / "fps")
    docs = spark.createDataFrame(
        [(1, GOOD), (2, OTHER), (3, PII_DOC), (4, GOOD)], ["doc_id", "text"]
    )
    docs.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_corpus_ingest(
        stream, corpus, fps, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = _read(spark, corpus)
    assert out.count() == 3  # 4 collapsed into 1's fingerprint (same batch)
    assert out.filter(F.col("text").contains("alice@example.com")).count() == 0
    assert out.agg(F.min("n_tokens")).first()[0] > 0


def test_sig_dir_near_dup_across_epochs(spark, tmp_path):
    """With sig_dir set, a later epoch's near-duplicate of an already-
    served doc is dropped (history wins), in-batch near-dups keep the
    min id, and a retried epoch still lands identically."""
    from geoestate_etl_spark.streaming.corpus_ingest import ingest_batch

    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    sigs = str(tmp_path / "sigs")
    kw = dict(sig_dir=sigs, jaccard_threshold=0.5)

    b0 = spark.createDataFrame([(1, GOOD), (2, OTHER)], ["doc_id", "text"])
    # 4 near-dups GOOD (history -> dropped); 5/6 are in-batch near twins
    # of a text history has never seen (min id 5 kept); 7 unrelated
    fresh = (
        "deep in the ancient forest a narrow path wound between mossy "
        "stones and towering pines where travelers rarely walked and "
        "the silence was broken only by the call of distant birds "
        "echoing through the misty air"
    )
    b1 = spark.createDataFrame(
        [
            (4, GOOD + " tonight"),
            (5, fresh + " maybe"),
            (6, fresh + " perhaps"),
            (7, PII_DOC),
        ],
        ["doc_id", "text"],
    )
    ingest_batch(b0, 0, corpus, fps, **kw)
    ingest_batch(b1, 1, corpus, fps, **kw)

    kept = {r.doc_id for r in _read(spark, corpus).collect()}
    assert kept == {1, 2, 5, 7}
    # standing signatures carry survivors only
    assert {r.id for r in _read(spark, sigs).select("id").collect()} == kept

    # retry epoch 1: history excludes the epoch's own partition, so the
    # outcome is identical (idempotent)
    before = sorted(map(str, _read(spark, corpus).collect()))
    ingest_batch(b1, 1, corpus, fps, **kw)
    assert sorted(map(str, _read(spark, corpus).collect())) == before


@pytest.mark.slow  # r10 verify-window tier (multi-epoch e2e; stages covered singly by the fast tests)
def test_sig_dir_dropped_doc_does_not_shadow_future_twin(spark, tmp_path):
    """A doc dropped as a near-dup must not linger in the standing
    table: a future twin should match the KEPT representative (and be
    dropped), which only works because survivors alone write sigs."""
    from geoestate_etl_spark.streaming.corpus_ingest import ingest_batch

    corpus, fps, sigs = (
        str(tmp_path / "c"), str(tmp_path / "f"), str(tmp_path / "s")
    )
    kw = dict(sig_dir=sigs, jaccard_threshold=0.5)
    ingest_batch(
        spark.createDataFrame([(1, GOOD)], ["doc_id", "text"]),
        0, corpus, fps, **kw,
    )
    ingest_batch(
        spark.createDataFrame([(2, GOOD + " tonight")], ["doc_id", "text"]),
        1, corpus, fps, **kw,
    )
    ingest_batch(
        spark.createDataFrame([(3, GOOD + " tonight")], ["doc_id", "text"]),
        2, corpus, fps, **kw,  # exact twin of the DROPPED 2 -> must still drop
    )
    assert {r.doc_id for r in _read(spark, corpus).collect()} == {1}


def test_sem_dir_semantic_dedup_across_epochs(spark, tmp_path):
    """Opt-in streaming SemDeDup (late r5): frozen-centroid cells, a
    later epoch's semantic twin of a served doc is dropped (history
    wins), in-batch twins keep the min id, docs WITHOUT an embedding
    pass through unexamined, the standing vector table carries
    survivors only, and a retried epoch lands identically."""
    from geoestate_etl_spark.streaming.corpus_ingest import ingest_batch

    corpus, fps, sem = (
        str(tmp_path / "c"), str(tmp_path / "f"), str(tmp_path / "m")
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]  # frozen — trained offline
    kw = dict(sem_dir=sem, sem_centroids=cents, sem_threshold=0.92)
    schema = "doc_id long, text string, embedding array<double>"

    fresh = (
        "deep in the ancient forest a narrow path wound between mossy "
        "stones and towering pines where travelers rarely walked"
    )
    b0 = spark.createDataFrame(
        [(1, GOOD, [1.0, 0.0]), (2, OTHER, [0.0, 1.0])], schema
    )
    b1 = spark.createDataFrame(
        [
            # semantic twin of served doc 1 (cos ≈ 0.990, same cell)
            (3, fresh + " one", [0.99, 0.14]),
            # no embedding: the coverage-gap rule admits it untouched
            (4, fresh + " two", None),
            # in-batch twins (cos ≈ 0.9997, cell 1) far enough from
            # history doc 2's [0,1] (cos 0.8 < 0.92): min id 5 kept
            (5, fresh + " three", [0.60, 0.80]),
            (6, fresh + " four", [0.62, 0.79]),
        ],
        schema,
    )
    ingest_batch(b0, 0, corpus, fps, **kw)
    ingest_batch(b1, 1, corpus, fps, **kw)

    kept = {r.doc_id for r in _read(spark, corpus).collect()}
    assert kept == {1, 2, 4, 5}
    # standing vectors: survivors only, and only rows that HAVE vectors
    assert {r.doc_id for r in _read(spark, sem).collect()} == {1, 2, 5}

    # retry epoch 1: own-partition exclusion makes it idempotent
    before = sorted(map(str, _read(spark, corpus).collect()))
    ingest_batch(b1, 1, corpus, fps, **kw)
    assert sorted(map(str, _read(spark, corpus).collect())) == before


def _mk_lang_batch(spark, lo, hi, text_pad=""):
    rows = [
        (i, ["en", "zh"][i % 2],
         GOOD + f" doc {i} {text_pad} extra tokens {i * 3} {i * 11}")
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_budget_dir_consumes_across_epochs(spark, tmp_path):
    """Opt-in budget stage: per-domain budgets fill across epochs,
    exhausted domains admit nothing later, and an epoch retry is a
    no-op for the consumed state (delta overwrite)."""
    corpus, fps, bud = (
        str(tmp_path / "c"), str(tmp_path / "f"), str(tmp_path / "b")
    )
    budgets = {"en": 120}  # zh has no budget -> never lands

    b0 = _mk_lang_batch(spark, 0, 8)
    b1 = _mk_lang_batch(spark, 8, 16, "later")
    ingest_batch(b0, 0, corpus, fps, gate=F.lit(True),
                 budget_dir=bud, mix_budgets=budgets)
    got0 = spark.read.parquet(corpus).collect()
    assert {r.lang for r in got0} == {"en"}
    t0 = sum(r.n_tokens for r in got0)
    state0 = spark.read.parquet(bud).groupBy("lang").agg(
        F.sum("tokens").alias("t")).collect()
    assert {r.lang: r.t for r in state0} == {"en": t0}

    ingest_batch(b1, 1, corpus, fps, gate=F.lit(True),
                 budget_dir=bud, mix_budgets=budgets)
    got01 = spark.read.parquet(corpus).collect()
    t01 = sum(r.n_tokens for r in got01)
    max_doc = max(r.n_tokens for r in got01)
    # budget respected with at most one overshoot doc per domain
    assert t01 - max_doc < 120
    assert {r.lang for r in got01} == {"en"}

    # retry epoch 1: same consumed state, same corpus
    before = sorted(map(str, got01))
    state_before = sorted(map(str, spark.read.parquet(bud).collect()))
    ingest_batch(b1, 1, corpus, fps, gate=F.lit(True),
                 budget_dir=bud, mix_budgets=budgets)
    assert sorted(map(str, spark.read.parquet(corpus).collect())) == before
    assert sorted(map(str, spark.read.parquet(bud).collect())) == state_before

    # once exhausted, later epochs admit nothing
    if t01 >= 120:
        b2 = _mk_lang_batch(spark, 16, 24, "third")
        ingest_batch(b2, 2, corpus, fps, gate=F.lit(True),
                     budget_dir=bud, mix_budgets=budgets)
        assert sorted(map(str, spark.read.parquet(corpus).collect())) == before


def test_epoch_metrics_ride_the_write(spark, tmp_path):
    """ingest_batch returns per-epoch funnel metrics from the
    Observation API — they must equal what the epoch actually wrote
    (collected on the write action itself, no extra job)."""
    corpus, fps = str(tmp_path / "mc"), str(tmp_path / "mf")
    b = spark.createDataFrame(
        [(1, GOOD), (2, GOOD), (3, OTHER)], ["doc_id", "text"]
    )  # 2 is an in-batch exact dup of 1
    m = ingest_batch(b, 0, corpus, fps)
    got = spark.read.parquet(corpus)
    assert m["n_written"] == got.count() == 2
    assert m["n_tokens"] == got.agg(F.sum("n_tokens")).first()[0]
    # empty epoch (everything already seen) still reports coherent zeros
    m2 = ingest_batch(b, 1, corpus, fps)
    assert m2 == {"n_written": 0, "n_tokens": 0}


@pytest.mark.slow  # r10 verify-window tier (multi-epoch e2e; stages covered singly by the fast tests)
def test_all_stages_combined_epoch(spark, tmp_path):
    """Every opt-in stage at once — fp + LSH signatures + semantic
    vectors + token budgets in one epoch sequence: stage ORDER holds
    (gate → exact → near-dup → semantic → budget), each standing
    table sees only served survivors, and a full-epoch retry is a
    no-op across all four state directories."""
    from geoestate_etl_spark.streaming.corpus_ingest import ingest_batch

    d = {k: str(tmp_path / k) for k in ("c", "f", "s", "m", "b")}
    cents = [[1.0, 0.0], [0.0, 1.0]]
    kw = dict(
        sig_dir=d["s"], jaccard_threshold=0.5,
        sem_dir=d["m"], sem_centroids=cents, sem_threshold=0.92,
        budget_dir=d["b"], mix_budgets={"en": 60, "zh": 10_000},
        mix_domain_col="lang",
    )
    schema = (
        "doc_id long, lang string, text string, embedding array<double>"
    )
    fresh = (
        "deep in the ancient forest a narrow path wound between mossy "
        "stones and towering pines where travelers rarely walked"
    )
    b0 = spark.createDataFrame(
        [(1, "en", GOOD, [1.0, 0.0]), (2, "en", OTHER, [0.0, 1.0])], schema
    )
    b1 = spark.createDataFrame(
        [
            (3, "en", GOOD, [0.5, 0.5]),             # exact dup of 1
            (4, "en", GOOD + " tonight", [0.5, 0.5]),  # near-dup of 1
            (5, "en", fresh + " one", [0.99, 0.14]),  # semantic twin of 1
            # textually UNRELATED to 5 (the LSH stage runs before the
            # semantic stage and would otherwise collapse 5/6 first)
            (6, "zh", (
                "rivers carve deep canyons through the red sandstone "
                "plateau while hawks circle over the dry valley floor "
                "waiting for the evening wind to rise"
            ), None),
        ],
        schema,
    )
    m0 = ingest_batch(b0, 0, d["c"], d["f"], **kw)
    m1 = ingest_batch(b1, 1, d["c"], d["f"], **kw)
    kept = {r.doc_id for r in _read(spark, d["c"]).collect()}
    assert kept == {1, 2, 6}
    assert m0["n_written"] == 2 and m1["n_written"] == 1
    # standing tables: served survivors only, vectors only where given
    assert {r.id for r in _read(spark, d["s"]).collect()} == {1, 2, 6}
    assert {r.doc_id for r in _read(spark, d["m"]).collect()} == {1, 2}
    # budget: en consumed by epoch-0 docs; zh by doc 6
    import pyspark.sql.functions as F

    consumed = {
        r.lang: r.t
        for r in _read(spark, d["b"])
        .groupBy("lang").agg(F.sum("tokens").alias("t")).collect()
    }
    assert consumed["zh"] > 0 and consumed["en"] > 0

    # full-epoch retry: every state dir lands byte-identically
    before = {
        k: sorted(map(str, _read(spark, p).collect())) for k, p in d.items()
        if k != "b"
    }
    ingest_batch(b1, 1, d["c"], d["f"], **kw)
    after = {
        k: sorted(map(str, _read(spark, p).collect())) for k, p in d.items()
        if k != "b"
    }
    assert before == after


def test_read_served_excludes_torn_epochs(spark, tmp_path):
    """Read-committed corpus reads: the fingerprint partition is the
    epoch's commit marker (written AFTER the corpus partition), so a
    torn epoch — documents landed, dedup state not — is invisible to
    read_served until the retry completes it."""
    from geoestate_etl_spark.streaming.corpus_ingest import (
        ingest_batch,
        read_served,
    )

    corpus, fps = str(tmp_path / "c"), str(tmp_path / "f")
    ingest_batch(
        spark.createDataFrame([(1, GOOD), (2, OTHER)], ["doc_id", "text"]),
        0, corpus, fps,
    )
    # simulate the torn state a crash between the two writes leaves:
    # epoch 1's documents exist, its fingerprints do not
    torn = spark.createDataFrame(
        [(3, GOOD + " tonight", 5)], ["doc_id", "text", "n_tokens"]
    )
    torn.write.mode("overwrite").parquet(f"{corpus}/epoch=1")
    assert {r.doc_id for r in read_served(spark, corpus, fps).collect()} == {
        1, 2,
    }
    # the raw reader DOES see the torn rows — the helper is the guard
    assert spark.read.parquet(corpus).count() == 3

    # the retried epoch completes; the same rows become visible
    b1 = spark.createDataFrame([(3, GOOD + " tonight")], ["doc_id", "text"])
    ingest_batch(b1, 1, corpus, fps)
    assert {r.doc_id for r in read_served(spark, corpus, fps).collect()} == {
        1, 2, 3,
    }


def test_read_served_torn_first_epoch_reads_empty(spark, tmp_path):
    """A crash before the very first fingerprint write leaves a corpus
    directory with NO commit markers at all: read_served returns an
    empty frame (correct — nothing committed), not an error."""
    from geoestate_etl_spark.streaming.corpus_ingest import read_served

    corpus, fps = str(tmp_path / "c"), str(tmp_path / "f")
    spark.createDataFrame(
        [(1, GOOD, 5)], ["doc_id", "text", "n_tokens"]
    ).write.parquet(f"{corpus}/epoch=0")
    assert read_served(spark, corpus, fps).count() == 0


def test_retry_uncommits_epoch_before_rewrite(spark, tmp_path):
    """ADVICE r5: crash-AFTER-fp-write retries. A prior attempt that
    crashed between the fp write and the checkpoint commit left epoch
    N committed; the retry must DELETE the marker before rewriting the
    corpus partition, so a reader racing the rewrite sees epoch N as
    uncommitted — never mid-overwrite (torn). Simulated by a retry
    whose rewrite job itself fails: the marker must already be gone."""
    import pytest
    from pyspark.sql import functions as F

    from geoestate_etl_spark.streaming.corpus_ingest import (
        ingest_batch,
        read_served,
    )

    corpus, fps = str(tmp_path / "c"), str(tmp_path / "f")
    ingest_batch(
        spark.createDataFrame([(1, GOOD), (2, OTHER)], ["doc_id", "text"]),
        0, corpus, fps,
    )
    b1 = spark.createDataFrame([(3, GOOD + " tonight")], ["doc_id", "text"])
    ingest_batch(b1, 1, corpus, fps)  # epoch 1 fully committed
    assert {r.doc_id for r in read_served(spark, corpus, fps).collect()} == {
        1, 2, 3,
    }

    # retry of epoch 1 that dies mid-rewrite (gate blows up inside the
    # corpus write job — the worst-case crash point for a racing reader)
    def _boom(_t):
        raise ValueError("simulated mid-rewrite crash")

    with pytest.raises(Exception):
        ingest_batch(
            b1, 1, corpus, fps, gate=F.udf(_boom, "boolean")("text"),
        )
    # the commit marker came OFF before the rewrite began: epoch 1 is
    # uncommitted (invisible), not torn — epoch 0 still serves
    assert {r.doc_id for r in read_served(spark, corpus, fps).collect()} == {
        1, 2,
    }

    # a clean retry re-commits the epoch with identical content
    ingest_batch(b1, 1, corpus, fps)
    assert {r.doc_id for r in read_served(spark, corpus, fps).collect()} == {
        1, 2, 3,
    }
