"""Deletion propagation ("right to be forgotten") for the ingest's
on-disk state.

A deletion request must remove a document from everywhere it could be
SERVED from or REMEMBERED by — the trap is the standing state: a
corpus row can be rewritten away while its fingerprint still blocks a
future legitimate re-submission, or its near-dup signature keeps
shadowing future twins. This op propagates one id list through all
three epoch-partitioned tables the streaming ingest maintains
(:mod:`geoestate_etl_spark.streaming.corpus_ingest`):

- ``corpus_dir/epoch=N`` — the served documents,
- ``fp_dir/epoch=N``     — exact-dedup fingerprints,
- ``sig_dir/epoch=N``    — MinHash/LSH signatures.

Scale shape: one semi-join probe finds the AFFECTED epochs (the id
list is the broadcast side); only those epoch partitions are
rewritten — a deletion of k documents touches O(k) partitions, never
the whole corpus. Each rewrite anti-joins the id list and
``localCheckpoint``s before overwriting (Spark refuses to overwrite a
path its own plan is still reading from).

Consumed token budgets are deliberately NOT refunded: the tokens were
served while the document existed, and reopening an exhausted domain
because of a deletion would re-admit different data into a mixture
that models already trained on. Refunds, if wanted, are a policy
decision for the caller (the per-epoch deltas under ``budget_dir``
make them computable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rewrite_epochs_without(
    spark: SparkSession,
    table_dir: str,
    epochs: list[int],
    drop: DataFrame,
    key: str,
) -> int:
    """Anti-join ``drop`` (on ``key``) out of each listed epoch
    partition and overwrite it in place. Returns rows removed."""
    from pyspark.errors import AnalysisException

    removed = 0
    for e in epochs:
        path = f"{table_dir}/epoch={e}"
        try:
            cur = spark.read.parquet(path)
        except AnalysisException:
            # table is opt-in per ingest run (sig_dir epochs may not
            # cover every corpus epoch) — nothing to rewrite here
            continue
        kept = cur.join(F.broadcast(drop), key, "left_anti")
        # break lineage from `path` before overwriting it: the write
        # would otherwise read from the directory it is deleting
        kept = kept.localCheckpoint(eager=True)
        removed += cur.count() - kept.count()
        kept.write.mode("overwrite").parquet(path)
    return removed


def forget_documents(
    spark: SparkSession,
    ids: DataFrame,
    corpus_dir: str,
    fp_dir: str | None = None,
    sig_dir: str | None = None,
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Propagate a deletion-id list through the ingest's state tables.

    ``ids`` is a one-column relation of ``id_col`` values (any size —
    it is the broadcast side of every probe). Returns audit counts:
    ``n_docs_deleted``, ``n_epochs_rewritten``, ``n_fps_removed``,
    ``n_sigs_removed``.
    """
    ids = ids.select(id_col).distinct()

    corpus = spark.read.parquet(corpus_dir)  # partition column: epoch
    hit = corpus.join(F.broadcast(ids), id_col, "semi")
    # the doomed rows' fingerprints, captured BEFORE the corpus rewrite
    # deletes their files (fp appears in exactly one epoch — the ingest
    # dedups on it). localCheckpoint, not persist: a recomputation
    # after the rewrite would re-list DELETED corpus files — the
    # fingerprints would silently survive and keep blocking re-crawls,
    # the exact guarantee this module exists to provide.
    doomed = hit.select(id_col, "fp", "epoch").localCheckpoint(eager=True)
    epochs = sorted(r.epoch for r in doomed.select("epoch").distinct().collect())
    fps = doomed.select("fp").distinct()

    removed = _rewrite_epochs_without(
        spark, corpus_dir, epochs, ids, id_col
    )
    n_fps = 0
    if fp_dir is not None and epochs:
        n_fps = _rewrite_epochs_without(spark, fp_dir, epochs, fps, "fp")
    n_sigs = 0
    if sig_dir is not None and epochs:
        n_sigs = _rewrite_epochs_without(
            spark, sig_dir, epochs, ids.select(F.col(id_col).alias("id")), "id"
        )
    return {
        "n_docs_deleted": removed,
        "n_epochs_rewritten": len(epochs),
        "n_fps_removed": n_fps,
        "n_sigs_removed": n_sigs,
    }
