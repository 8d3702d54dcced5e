"""Skew stress assertions (r8 — VERDICT r7 #3): the audited caps and
the adaptive skew join keep candidate volume bounded where the
uncapped path provably explodes. Small inline corpora (the full
sf1-equivalent drill is ``tools/skew_stress.py``, recorded in
BENCH_HISTORY.md §skew); these pin the MECHANISMS:

- a boilerplate-hot LSH band whose uncapped candidate volume is
  quadratic in the hot-block size, capped volume bounded and audited;
- a hot SemDeDup cluster, same contract on the cell self-join;
- a celebrity join key: detection + salted-join result equality;
- Zipf domains through the budgeted mixture sampler: budgets met
  exactly despite one dominant domain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.operators.dedup import (
    band_explode,
    cap_hot_buckets,
    hot_buckets,
    minhash_near_dups,
    minhash_signatures,
)

HOT, COLD = 600, 1000


def pair_volume(banded, keys) -> int:
    return int(
        banded.groupBy(*keys)
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")))
        .first()[0]
        or 0
    )


@pytest.fixture(scope="module")
def skew_docs(spark):
    vocab = [f"w{i:03d}" for i in range(200)]
    boiler = " ".join(vocab[i % len(vocab)] for i in range(7, 367, 6))
    rows = []
    for i in range(HOT):
        rows.append((i, f"{boiler} uniq{i:05d} tail{i:05d}"))
    import random

    rng = random.Random(5)
    for i in range(HOT, HOT + COLD):
        rows.append(
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 60))))
        )
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)


def test_lsh_hot_band_capped_volume_and_audit(spark, skew_docs):
    cap = 64
    sigs = minhash_signatures(skew_docs, "text", "doc_id", 3, 24).persist()
    banded = band_explode(sigs, 24, 8).persist()
    try:
        vol_uncapped = pair_volume(banded, ["band_hash"])
        vol_capped = pair_volume(
            cap_hot_buckets(banded, ["band_hash"], cap), ["band_hash"]
        )
        # the hot block collides in ~every band: uncapped volume is at
        # least one full band's C(HOT, 2); capped is orders smaller
        assert vol_uncapped >= HOT * (HOT - 1) // 2
        assert vol_capped * 50 < vol_uncapped
        # the audit names the hot buckets (≥1 bucket over cap, holding
        # ~the hot block)
        audit = hot_buckets(banded, ["band_hash"], cap).collect()
        assert len(audit) >= 1
        # ~all of the hot block lands in one bucket (a few docs' unique
        # tail words win a minhash slot and perturb their signature)
        assert max(r["n_members"] for r in audit) >= HOT * 9 // 10
        # the capped operator path completes with bounded pair output:
        # every surviving pair comes from cold/under-cap buckets
        pairs = minhash_near_dups(
            skew_docs, "text", "doc_id", num_hashes=24, bands=8,
            jaccard_threshold=0.7, max_bucket_size=cap,
        )
        assert pairs.count() <= vol_capped
    finally:
        banded.unpersist()
        sigs.unpersist()


def test_semantic_hot_cluster_capped_and_audited(spark):
    import numpy as np

    from geoestate_etl_spark.operators.semantic_dedup import (
        cluster_embeddings,
        semantic_pairs,
    )

    rng = np.random.default_rng(11)
    n, hot, dim = 1200, 500, 16
    v = rng.standard_normal((n, dim)).astype("float32")
    centroid = rng.standard_normal(dim).astype("float32") * 3.0
    v[:hot] = centroid[None, :] + 0.01 * rng.standard_normal((hot, dim)).astype(
        "float32"
    )
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    clustered = cluster_embeddings(emb, n_cells=8, id_col="vec_id").join(
        emb, "vec_id"
    ).persist()
    try:
        cap = 64
        vol_uncapped = pair_volume(clustered, ["cell"])
        vol_capped = pair_volume(
            cap_hot_buckets(clustered, ["cell"], cap), ["cell"]
        )
        assert vol_uncapped >= hot * (hot - 1) // 2  # hot cell is quadratic
        assert vol_capped * 50 < vol_uncapped
        audit = hot_buckets(clustered, ["cell"], cap)
        assert audit.count() >= 1
        n_pairs = semantic_pairs(
            clustered, 0.9, id_col="vec_id", max_cluster_size=cap
        ).count()
        assert n_pairs <= vol_capped
    finally:
        clustered.unpersist()


def test_celebrity_key_detected_and_adaptive_join_exact(spark):
    from geoestate_etl_spark.operators.skew import adaptive_skew_join, hot_keys

    n_fact, n_keys = 200_000, 1000
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    hot = {r.k for r in hot_keys(fact, ["k"], threshold_frac=0.01).collect()}
    assert 0 in hot  # the celebrity is detected
    plain = fact.join(dim, "k")
    adaptive = adaptive_skew_join(fact, dim, ["k"])
    assert adaptive.count() == plain.count()
    # exact multiset equality, aggregated form (cheap at this size)
    a = adaptive.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s"), F.sum("attr").alias("t")
    )
    p = plain.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s"), F.sum("attr").alias("t")
    )
    assert a.exceptAll(p).limit(1).count() == 0
    assert p.exceptAll(a).limit(1).count() == 0


def test_zipf_domain_mixture_budgets_met(spark):
    import random

    from geoestate_etl_spark.operators.sampling import sample_to_token_budget

    rng = random.Random(7)
    domains = [f"src{i}" for i in range(6)]
    # Zipf-ish: domain i chosen with weight 1/(i+1)^1.5 → src0 dominates
    weights = [1.0 / (i + 1) ** 1.5 for i in range(6)]
    rows = [
        (
            i,
            rng.choices(domains, weights)[0],
            rng.randint(5, 200),
        )
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    budgets = {d: 5_000 for d in domains}
    mix = sample_to_token_budget(
        df, "source", "n_tokens", budgets, id_col="doc_id"
    ).persist()
    try:
        # every kept row STARTS under its domain budget (overshoot ≤ 1 doc)
        assert mix.filter(F.col("domain_start") >= 5_000).count() == 0
        # each domain's budget is actually consumed (the dominant domain
        # must not starve the tail domains, nor vice versa)
        got = {
            r.source: (r.toks, r.mx)
            for r in mix.groupBy("source")
            .agg(
                F.sum("n_tokens").alias("toks"),
                F.max(F.col("domain_start") + F.col("n_tokens")).alias("mx"),
            )
            .collect()
        }
        for d in domains:
            toks, mx = got[d]
            assert mx >= 5_000 or toks >= 4_000  # budget reached (±1 doc)
    finally:
        mix.unpersist()
