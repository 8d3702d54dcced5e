"""Streaming corpus ingestion: the training-data pipeline's gate /
dedup / scrub stages applied continuously to a document stream.

``readStream → foreachBatch`` with the same epoch-keyed idempotent
sink pattern the engine uses for serving writes (replacing the
reference's hand-rolled driver-side INSERT batching,
``dags/main.py:381-437``): each micro-batch

1. applies the quality gate (:func:`~geoestate_etl_spark.plans.\
corpus_pipeline.quality_gate` by default),
2. drops documents whose raw-text fingerprint already exists in the
   standing fingerprint table (cross-batch exact dedup — O(batch)
   work per trigger, never a rescan of the accumulated corpus),
3. collapses in-batch exact dups to the min-id keeper,
4. scrubs PII and counts tokens,
5. writes survivors to ``corpus_dir/epoch=N`` and their fingerprints
   to ``fp_dir/epoch=N`` — both ``overwrite`` per epoch, so a retried
   micro-batch lands identically (idempotent, no dup rows).

Near-dup (LSH) removal joins the per-trigger path OPT-IN via
``sig_dir``: each epoch runs
:func:`~geoestate_etl_spark.operators.dedup.incremental_near_dups`
against the standing signature table — O(batch) bucket joins, never a
rescan — dropping batch docs that near-match history (history is
already served, so it always wins) or a smaller-id batch sibling.
Without ``sig_dir``, near-dup stays a slower-cadence corpus job
(``plans.corpus_pipeline.run_corpus``), the pre-r3 behavior.

Semantic (SemDeDup) removal joins the per-trigger path OPT-IN via
``sem_dir`` + ``sem_centroids`` (late r5): cells are assigned with the
FROZEN centroid list (the ``ivf_append`` add-after-train lifecycle —
retraining is a slower-cadence job that re-materializes the standing
table), each epoch runs
:func:`~geoestate_etl_spark.operators.semantic_dedup.\
incremental_semantic_dedup` against the standing ``(id, cell,
embedding)`` table — O(batch × touched-cells) equi-join work, never a
corpus rescan — and survivors' vectors land under ``sem_dir/epoch=N``
(served-survivors-only, the same policy as the signature table).
Documents without an embedding pass through unexamined — the same
coverage-gap rule as ``run_corpus``.

Token-budget mixing joins OPT-IN via ``budget_dir`` + ``mix_budgets``:
each epoch consumes the remaining per-domain budgets with
:func:`~geoestate_etl_spark.operators.sampling.consume_token_budget`
(state = per-epoch consumption deltas under ``budget_dir/epoch=N``,
summed excluding the current epoch — the same overwrite-own-epoch
retry idempotence as the fingerprint and signature tables). Exhausted
domains admit nothing in later epochs; the stream keeps running so
un-exhausted domains continue to fill.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from geoestate_etl_spark.functions.text import (
    fingerprint_md5,
    scrub_pii,
    token_count,
)
from geoestate_etl_spark.plans.corpus_pipeline import quality_gate


def _delete_dir(spark, path: str) -> None:
    """Recursively delete ``path`` through the Hadoop FileSystem API
    (so it works on whatever scheme the dirs live on — local, HDFS,
    object store). Missing paths are a no-op."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def ingest_batch(
    batch: DataFrame,
    epoch_id: int,
    corpus_dir: str,
    fp_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    gate: Column | None = None,
    sig_dir: str | None = None,
    jaccard_threshold: float = 0.7,
    sem_dir: str | None = None,
    sem_centroids: list[list[float]] | None = None,
    sem_threshold: float = 0.92,
    embedding_col: str = "embedding",
    budget_dir: str | None = None,
    mix_budgets: dict[str, int] | None = None,
    mix_domain_col: str = "lang",
) -> dict[str, int]:
    """One micro-batch of the ingest (also callable on a plain batch
    DataFrame — the streaming/batch twin pattern used throughout).

    Returns per-epoch funnel metrics ``{n_written, n_tokens}``
    collected with the Observation API — they ride the epoch write
    action itself, so observability costs ZERO extra jobs (the
    batch-pipeline funnel pays one aggregate action per count; a
    per-trigger path cannot afford that).
    """
    from pyspark.sql import Observation

    spark = batch.sparkSession
    gate = quality_gate(text_col) if gate is None else gate

    # UN-COMMIT this epoch before touching its row state: if a prior
    # attempt crashed AFTER the fp write but before the checkpoint
    # commit, the epoch's commit marker exists while this retry is
    # about to overwrite corpus_dir/epoch=N — without the delete, a
    # concurrent read_served could observe the epoch mid-overwrite
    # (torn) despite the marker. Deleting first closes that window:
    # the marker is absent for the whole rewrite and reappears only
    # with the final fp write below.
    _delete_dir(spark, f"{fp_dir}/epoch={epoch_id}")

    with_fp = batch.filter(gate).withColumn("fp", fingerprint_md5(text_col))
    try:
        # exclude THIS epoch's own partition: on a micro-batch retry it
        # already exists, and treating it as "seen" would anti-join the
        # whole batch away and overwrite the epoch with nothing
        seen = (
            spark.read.parquet(fp_dir)
            .filter(F.col("epoch") != epoch_id)
            .select("fp")
            .distinct()
        )
        with_fp = with_fp.join(seen, "fp", "left_anti")
    except AnalysisException:  # first epoch: no standing table yet
        pass

    keepers = with_fp.groupBy("fp").agg(F.min(id_col).alias("_keep"))
    exact = (
        with_fp.join(keepers, "fp")
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )

    batch_sigs = None
    if sig_dir is not None:
        from geoestate_etl_spark.operators.dedup import incremental_near_dups

        try:
            standing = (
                spark.read.parquet(sig_dir)
                .filter(F.col("epoch") != epoch_id)  # retry-safe, as above
                .select("id", "sh", "sig")
            )
        except AnalysisException:  # first epoch: no standing signatures
            standing = None
        # banding matched to run_corpus's removal threshold (24 hashes /
        # 8 bands -> S-curve midpoint 0.5; see run_corpus)
        pairs, batch_sigs = incremental_near_dups(
            exact, standing, text_col, id_col,
            num_hashes=24, bands=8, jaccard_threshold=jaccard_threshold,
        )
        # keeper policy (shared helper): history always wins, min id
        # wins within the batch
        from geoestate_etl_spark.operators.dedup import batch_drop_ids

        drops = batch_drop_ids(pairs, exact.select(id_col), id_col)
        exact = exact.join(drops, id_col, "left_anti")

    sem_vecs = None
    if sem_dir is not None and sem_centroids is not None:
        from geoestate_etl_spark.operators.semantic_dedup import (
            incremental_semantic_dedup,
        )
        from geoestate_etl_spark.operators.similarity import assign_cells

        # coverage gaps pass through unexamined (the run_corpus rule);
        # everything WITH a vector goes through frozen-centroid cells
        clustered = assign_cells(
            exact.filter(F.col(embedding_col).isNotNull()),
            sem_centroids,
            vec_col=embedding_col,
        ).select(id_col, "cell", embedding_col)
        try:
            standing_sem = (
                spark.read.parquet(sem_dir)
                .filter(F.col("epoch") != epoch_id)  # retry-safe, as above
                .select(id_col, "cell", embedding_col)
            )
        except AnalysisException:  # first epoch: no standing vectors
            standing_sem = None
        _pairs, decisions = incremental_semantic_dedup(
            clustered,
            standing_sem,
            cosine_threshold=sem_threshold,
            id_col=id_col,
            vec_col=embedding_col,
        )
        sem_drops = decisions.filter(~F.col("kept")).select(id_col)
        exact = exact.join(sem_drops, id_col, "left_anti")
        sem_vecs = clustered

    clean = exact.withColumn(text_col, scrub_pii(text_col)).withColumn(
        "n_tokens", token_count(text_col)
    )
    # one materialization per epoch: the corpus/fp/sig writes — and,
    # with budgets on, the cumsum boundary jobs plus the delta write —
    # would otherwise each re-execute the gate/anti-join/dedup lineage
    base = clean = clean.persist()

    budget_delta = None
    if budget_dir is not None and mix_budgets is not None:
        from geoestate_etl_spark.operators.sampling import consume_token_budget

        try:
            consumed = (
                spark.read.parquet(budget_dir)
                .filter(F.col("epoch") != epoch_id)  # retry-safe, as above
                .groupBy(mix_domain_col)
                .agg(F.sum("tokens").cast("long").alias("tokens"))
            )
        except AnalysisException:  # first epoch: nothing consumed yet
            consumed = None
        clean, _total = consume_token_budget(
            clean, consumed, mix_domain_col, "n_tokens", mix_budgets,
            id_col=id_col,
        )
        clean = clean.drop("domain_start")
        # THIS epoch's consumption delta (not the running total): the
        # standing state is the SUM over epoch partitions, so a retried
        # epoch overwrites its own delta and the fold stays exact
        budget_delta = clean.groupBy(mix_domain_col).agg(
            F.sum("n_tokens").cast("long").alias("tokens")
        )

    # epoch-keyed overwrite = idempotent on micro-batch retry; the
    # funnel observation rides this same action (no extra job)
    obs = Observation(f"ingest_epoch_{epoch_id}")
    clean = clean.observe(
        obs,
        F.count(F.lit(1)).alias("n_written"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
    )
    clean.write.mode("overwrite").parquet(f"{corpus_dir}/epoch={epoch_id}")
    metrics = {k: int(v) for k, v in obs.get.items()}
    if budget_delta is not None:
        budget_delta.write.mode("overwrite").parquet(
            f"{budget_dir}/epoch={epoch_id}"
        )
    clean.select("fp").write.mode("overwrite").parquet(f"{fp_dir}/epoch={epoch_id}")
    if batch_sigs is not None:
        # standing signatures carry SURVIVORS only: a dropped doc must
        # not block a future twin whose kept representative is already
        # in the table (the kept rep's signature does that)
        batch_sigs.join(
            clean.select(F.col(id_col).alias("id")), "id", "semi"
        ).write.mode("overwrite").parquet(f"{sig_dir}/epoch={epoch_id}")
        batch_sigs.unpersist()
    if sem_vecs is not None:
        # same served-survivors-only policy as the signature table:
        # a doc the budget stage later dropped was never served, so
        # its vector must not shadow a future arrival
        sem_vecs.join(clean.select(id_col), id_col, "semi").write.mode(
            "overwrite"
        ).parquet(f"{sem_dir}/epoch={epoch_id}")
    base.unpersist()
    return metrics


def start_corpus_ingest(
    doc_stream: DataFrame,
    corpus_dir: str,
    fp_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    gate: Column | None = None,
    sig_dir: str | None = None,
    jaccard_threshold: float = 0.7,
    sem_dir: str | None = None,
    sem_centroids: list[list[float]] | None = None,
    sem_threshold: float = 0.92,
    embedding_col: str = "embedding",
    budget_dir: str | None = None,
    mix_budgets: dict[str, int] | None = None,
    mix_domain_col: str = "lang",
) -> StreamingQuery:
    """Attach the ingest to a streaming document source and start it."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            batch, epoch_id, corpus_dir, fp_dir,
            id_col=id_col, text_col=text_col, gate=gate,
            sig_dir=sig_dir, jaccard_threshold=jaccard_threshold,
            sem_dir=sem_dir, sem_centroids=sem_centroids,
            sem_threshold=sem_threshold, embedding_col=embedding_col,
            budget_dir=budget_dir, mix_budgets=mix_budgets,
            mix_domain_col=mix_domain_col,
        )

    return (
        doc_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_served(
    spark, corpus_dir: str, fp_dir: str
) -> DataFrame:
    """READ-COMMITTED view of the streaming corpus: only epochs whose
    fingerprint partition exists are visible.

    :func:`ingest_batch` brackets the epoch's row state with the
    fingerprint partition as a commit marker: it DELETES
    ``fp_dir/epoch=N`` first (un-commit — covers a retry of an attempt
    that crashed after the fp write but before the checkpoint commit),
    writes the corpus partition, and re-writes fingerprints LAST. So a
    concurrent reader (serving queries while the ingest stream runs,
    or a downstream job racing the trigger) that goes through this
    helper can never observe a torn epoch: the marker is absent for
    the entire window in which the epoch's documents are being
    (re)written. Without the marker rule, such a reader would serve
    documents that a crashed-and-retried epoch is about to
    OVERWRITE — the read-side half of the overwrite-own-epoch
    idempotence story.

    Scale shape: committed epoch ids are collected (bounded — one row
    per epoch, not per document) and applied as a static ``isin``
    partition filter, so the corpus scan PRUNES uncommitted epoch
    directories at planning time instead of filtering rows.
    """
    try:
        committed = [
            r.epoch
            for r in spark.read.parquet(fp_dir)
            .select("epoch")
            .distinct()
            .collect()
        ]
    except AnalysisException:
        # no fingerprint table at all: nothing has committed — even a
        # torn epoch 0 (corpus partition landed, crash before the fp
        # write) must read as EMPTY, not as an error
        committed = []
    corpus = spark.read.parquet(corpus_dir)
    return corpus.filter(F.col("epoch").isin(committed))
