"""Skew stress drill (r8 — VERDICT r7 #3): capped vs uncapped volumes
and wall times on the Zipfian tier ``tools/gen_skew.py`` synthesizes.

Prints one table (and a JSON line) with, per mechanism:

- the CANDIDATE VOLUME the quadratic stage would generate uncapped
  (exact arithmetic over bucket/cell occupancies — no need to execute
  the explosion to count it) vs the capped volume;
- measured wall time of the capped path, and of the uncapped path.
  The uncapped legs are bounded at THIS tier (measured ≤1 min each on
  local[32]); scale the generator up only with a shell-level timeout —
  the blowup is quadratic in the hot-block size by construction.

Run on an idle host: ``python tools/skew_stress.py``. Results are
recorded in BENCH_HISTORY.md §skew. The cheap assertions live in
``tests/test_skew_stress.py``; this drill is the full-volume evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geoestate_etl_spark.session import get_spark

SKEW_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "skew"
)


def pair_volume(banded, keys) -> int:
    """Exact candidate-pair count the bucket self-join would produce:
    Σ_buckets C(n, 2) — arithmetic over occupancies, not the join."""
    return int(
        banded.groupBy(*keys)
        .count()
        .agg(F.sum(F.expr("count * (count - 1) / 2")))
        .first()[0]
        or 0
    )


def main() -> None:
    spark = get_spark("skew-stress")
    docs = spark.read.parquet(f"{SKEW_DIR}/documents.parquet").repartition(32)
    emb = spark.read.parquet(f"{SKEW_DIR}/embeddings.parquet").repartition(32)
    docs.count()
    emb.count()
    out: dict = {}

    # --- LSH hot band -----------------------------------------------------
    from geoestate_etl_spark.operators.dedup import (
        band_explode,
        cap_hot_buckets,
        minhash_near_dups,
        minhash_signatures,
    )

    CAP = 256
    sigs = minhash_signatures(docs, "text", "doc_id", 3, 24).persist()
    sigs.count()
    banded = band_explode(sigs, 24, 8).persist()
    banded.count()
    vol_uncapped = pair_volume(banded, ["band_hash"])
    vol_capped = pair_volume(cap_hot_buckets(banded, ["band_hash"], CAP), ["band_hash"])
    t0 = time.perf_counter()
    n_capped_pairs = minhash_near_dups(
        docs, "text", "doc_id", num_hashes=24, bands=8,
        jaccard_threshold=0.7, max_bucket_size=CAP,
    ).count()
    t_capped = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_uncapped_pairs = minhash_near_dups(
        docs, "text", "doc_id", num_hashes=24, bands=8,
        jaccard_threshold=0.7, max_bucket_size=None,
    ).count()
    t_uncapped = time.perf_counter() - t0
    out["lsh"] = {
        "cap": CAP,
        "candidate_volume_uncapped": vol_uncapped,
        "candidate_volume_capped": vol_capped,
        "pairs_capped": n_capped_pairs,
        "pairs_uncapped": n_uncapped_pairs,
        "wall_capped_s": round(t_capped, 2),
        "wall_uncapped_s": round(t_uncapped, 2),
    }
    banded.unpersist()
    sigs.unpersist()

    # --- SemDeDup hot cluster ----------------------------------------------
    from geoestate_etl_spark.operators.semantic_dedup import (
        cluster_embeddings,
        semantic_pairs,
    )

    clustered = cluster_embeddings(emb, n_cells=16, id_col="vec_id").join(
        emb, "vec_id"
    ).persist()
    clustered.count()
    vol_sem_uncapped = pair_volume(clustered, ["cell"])
    vol_sem_capped = pair_volume(
        cap_hot_buckets(clustered, ["cell"], CAP), ["cell"]
    )
    t0 = time.perf_counter()
    n_sem_capped = semantic_pairs(
        clustered, 0.9, id_col="vec_id", max_cluster_size=CAP
    ).count()
    t_sem_capped = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_sem_uncapped = semantic_pairs(
        clustered, 0.9, id_col="vec_id", max_cluster_size=None
    ).count()
    t_sem_uncapped = time.perf_counter() - t0
    out["semantic"] = {
        "cap": CAP,
        "candidate_volume_uncapped": vol_sem_uncapped,
        "candidate_volume_capped": vol_sem_capped,
        "pairs_capped": n_sem_capped,
        "pairs_uncapped": n_sem_uncapped,
        "wall_capped_s": round(t_sem_capped, 2),
        "wall_uncapped_s": round(t_sem_uncapped, 2),
    }
    clustered.unpersist()

    # --- celebrity join key -------------------------------------------------
    from geoestate_etl_spark.operators.skew import adaptive_skew_join, hot_keys

    n_fact, n_keys = 2_000_000, 10_000
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        F.col("id").alias("payload"),
    ).persist()
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    ).persist()
    fact.count()
    dim.count()
    hot = [r.k for r in hot_keys(fact, ["k"], threshold_frac=0.01).collect()]
    t0 = time.perf_counter()
    n_plain = fact.join(dim, "k").count()
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_adaptive = adaptive_skew_join(fact, dim, ["k"]).count()
    t_adaptive = time.perf_counter() - t0
    out["celebrity_join"] = {
        "n_fact": n_fact,
        "hot_keys_detected": hot,
        "rows_plain": n_plain,
        "rows_adaptive": n_adaptive,
        "wall_plain_s": round(t_plain, 2),
        "wall_adaptive_s": round(t_adaptive, 2),
    }
    fact.unpersist()
    dim.unpersist()

    # --- Zipf-domain budgeted mixture ---------------------------------------
    from geoestate_etl_spark.operators.sampling import sample_to_token_budget

    with_toks = docs.withColumn("n_tokens", F.size(F.split("text", " ")))
    budgets = {f"src{i}": 20_000 for i in range(10)}
    t0 = time.perf_counter()
    mix = sample_to_token_budget(
        with_toks, "source", "n_tokens", budgets, id_col="doc_id"
    ).persist()
    n_mix = mix.count()
    t_mix = time.perf_counter() - t0
    starts_ok = (
        mix.filter(F.col("domain_start") >= 20_000).count() == 0
    )
    mix.unpersist()
    out["zipf_mixture"] = {
        "rows_selected": n_mix,
        "budgets_respected": bool(starts_ok),
        "wall_s": round(t_mix, 2),
    }

    print("\n== skew stress ==")
    for k, v in out.items():
        print(f"{k}: {json.dumps(v)}")
    print(json.dumps({"skew_stress": out}))


if __name__ == "__main__":
    main()
