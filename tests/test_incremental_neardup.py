"""History-aware incremental near-dup removal (operators/dedup.py:
incremental_near_dups / update_signatures).

The contract under test: processing a corpus batch-by-batch against a
standing signature table reports exactly the pairs a full-corpus rerun
would — each pair exactly once, on the batch that completes it — while
never recomputing history-vs-history work. This is the O(batch) story
a 100 TB ingest needs (the full-rerun path rescans the corpus per
batch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.operators.dedup import (
    incremental_near_dups,
    minhash_near_dups,
    minhash_signatures,
    update_signatures,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different words about database engines and columnar storage"
OTHER2 = "unrelated prose describing mountains rivers valleys and weather patterns"

BATCH1 = [(1, BASE), (2, BASE), (5, OTHER)]
BATCH2 = [(4, NEAR), (6, OTHER2), (7, OTHER)]

KW = dict(jaccard_threshold=0.3)


def _pairs(df) -> dict[tuple[int, int], float]:
    return {(r.id_a, r.id_b): r.jaccard for r in df.collect()}


@pytest.fixture(scope="module")
def batches(spark):
    b1 = spark.createDataFrame(BATCH1, ["doc_id", "text"])
    b2 = spark.createDataFrame(BATCH2, ["doc_id", "text"])
    return b1, b2


def test_batch2_sees_cross_batch_pairs_only_once(batches):
    b1, b2 = batches
    p1, sigs1 = incremental_near_dups(b1, None, "text", "doc_id", **KW)
    standing = update_signatures(None, sigs1)
    p2, _ = incremental_near_dups(b2, standing, "text", "doc_id", **KW)
    pairs1, pairs2 = _pairs(p1), _pairs(p2)
    assert pairs1.get((1, 2)) == 1.0            # in-batch exact dup, batch 1
    assert pairs2.get((5, 7)) == 1.0            # cross-batch exact dup
    assert (1, 4) in pairs2                     # cross-batch near dup
    assert (1, 2) not in pairs2                 # history-vs-history: never re-reported
    assert not set(pairs1) & set(pairs2)        # each pair on exactly one batch


def test_batch_sequence_equals_full_rerun(batches, spark):
    """Fold invariant: Σ per-batch pairs == one full-corpus run, values
    included — for the 2-batch split and for singleton batches."""
    b1, b2 = batches
    full = _pairs(
        minhash_near_dups(b1.unionByName(b2), "text", "doc_id", **KW)
    )

    p1, sigs1 = incremental_near_dups(b1, None, "text", "doc_id", **KW)
    p2, _ = incremental_near_dups(
        b2, update_signatures(None, sigs1), "text", "doc_id", **KW
    )
    assert {**_pairs(p1), **_pairs(p2)} == full

    # one doc per batch, arbitrary arrival order
    standing, seen = None, {}
    for doc in [BATCH2[0], BATCH1[0], BATCH1[2], BATCH2[2], BATCH1[1], BATCH2[1]]:
        batch = spark.createDataFrame([doc], ["doc_id", "text"])
        p, sigs = incremental_near_dups(batch, standing, "text", "doc_id", **KW)
        got = _pairs(p)
        assert not set(got) & set(seen)
        seen.update(got)
        standing = update_signatures(standing, sigs)
    assert seen == full


def test_update_signatures_keeps_first_ingest(batches):
    b1, _ = batches
    sigs = minhash_signatures(b1, "text", "doc_id")
    standing = update_signatures(update_signatures(None, sigs), sigs)
    assert standing.count() == 3  # re-ingest of same ids is a no-op
    assert standing.select("id").distinct().count() == 3


def test_incremental_join_is_bucketed_not_cartesian(batches):
    b1, b2 = batches
    _, sigs1 = incremental_near_dups(b1, None, "text", "doc_id", **KW)
    p2, _ = incremental_near_dups(b2, sigs1, "text", "doc_id", **KW)
    plan = p2._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hot_bucket_cap_suppresses_pairs_consistently(spark):
    """With a cap of 1, every bucket the twin docs share is hot, so the
    incremental path must report no pairs — same as the full path."""
    b1 = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
    b2 = spark.createDataFrame([(2, BASE)], ["doc_id", "text"])
    _, sigs1 = incremental_near_dups(
        b1, None, "text", "doc_id", max_bucket_size=1, **KW
    )
    p2, _ = incremental_near_dups(
        b2, sigs1, "text", "doc_id", max_bucket_size=1, **KW
    )
    full = minhash_near_dups(
        b1.unionByName(b2), "text", "doc_id", max_bucket_size=1, **KW
    )
    assert p2.count() == 0 and full.count() == 0


# --- generative fold invariance ---------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

# Small vocab forces real shingle collisions; doc length 3..8 words
# straddles the k=3 shingle boundary (shorter docs exercise the
# whole-doc-shingle path).
_WORD = st.sampled_from([f"t{i}" for i in range(12)])
_DOC = st.lists(_WORD, min_size=3, max_size=8).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(_DOC, min_size=4, max_size=10),
    cut=st.integers(min_value=1, max_value=3),
)
def test_fold_invariant_on_random_corpora(spark, docs, cut):
    """For ANY corpus and ANY 2-batch split: per-batch incremental
    pairs partition the full-corpus pair set (values included). Cap
    disabled — arrival-time cap divergence is documented behavior."""
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(jaccard_threshold=0.3, max_bucket_size=None)
    full = _pairs(minhash_near_dups(df, "text", "doc_id", **kw))

    cut = min(cut, len(rows) - 1)
    b1 = spark.createDataFrame(rows[:cut], ["doc_id", "text"])
    b2 = spark.createDataFrame(rows[cut:], ["doc_id", "text"])
    p1, sigs1 = incremental_near_dups(b1, None, "text", "doc_id", **kw)
    p2, _ = incremental_near_dups(
        b2, update_signatures(None, sigs1), "text", "doc_id", **kw
    )
    got1, got2 = _pairs(p1), _pairs(p2)
    assert not set(got1) & set(got2)
    assert {**got1, **got2} == full
