"""Regenerate PLANS.md: annotated physical plans of flagship queries.

Run from the repo root: ``python tools/gen_plans.py``. AQE is disabled
for display only, so the full static plan (join strategies, exchanges,
pushdown) is visible; production and bench keep AQE on.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoestate_etl_spark.plans import all_queries
from geoestate_etl_spark.session import get_spark

SF = "/root/testdata/sf0.01"

NOTES = {
    "filter_project": (
        "Predicate AND projection reach the parquet scan: PushedFilters "
        "carries the quantity filter, ReadSchema lists only the 4 needed "
        "columns. At 100 TB this is the difference between scanning 4 "
        "columns and scanning 16."
    ),
    "filtered_topk": (
        "orderBy+limit compiles to TakeOrderedAndProject: per-partition "
        "bounded heaps, k rows per partition to the driver. No global "
        "sort ever materializes."
    ),
    "star_revenue": (
        "Both small dims broadcast (BroadcastHashJoin); the fact table is "
        "never shuffled for the joins; the aggregation is partial "
        "(map-side) then final."
    ),
    "renumber_parity": (
        "Dense global ids both ways in one plan: the faithful global "
        "window (reference semantics) joined to the scalable variant — "
        "range-shuffle by key, partition-local row_number, tiny offsets "
        "frame broadcast back. The join's hash-match proves the scalable "
        "path is byte-identical to the single-task-sort one it replaces."
    ),
    "near_dup_pairs": (
        "All three LSH families (minhash banding, simhash byte-blocks, "
        "hyperplane embedding buckets) are equi-joins on bucket keys: no "
        "CartesianProduct anywhere. Hot buckets above the occupancy cap "
        "are anti-joined out (broadcast) before any self-join; shingle "
        "arrays stay out of the exploded join and re-attach by id."
    ),
    "similarity_ann": (
        "IVF side serves from the committed oracle checkpoint: the "
        "`cell IN (...)` filter pushes into the (id, cell) assignment "
        "scan, and the pruned assignment broadcast-joins the embeddings "
        "by id. The cell-PARTITIONED warehouse layout (true partition "
        "pruning, `ann_certify`'s subject) is the 100 TB serving shape; "
        "the quantizer never retrains at query time (build is a "
        "separate lifecycle, similarity_index_build in bench)."
    ),
    "text_metrics": (
        "Per-doc stats/quality/lang-id AND the frozen-literal classifier "
        "margin (mq_margin_micro: literal-map fold, zero extra shuffle) "
        "are one codegen'd/map-side projection; since r6 the gram-derived "
        "columns (2-/3-gram repetition + char-3-gram LM score) come from "
        "ONE disk-backed prepared artifact (plans/prepared.py — built "
        "once per source table, merged on doc_id), so the serving plan "
        "is base projection + one parquet-scan left join instead of "
        "three explode→hash-agg chains per session. The gram BUILDS "
        "remain interpreted HOFs, so each spreads an under-partitioned "
        "source first (the "
        "single-file trap: 13s serialized vs ~1s spread, TUNING.md)."
    ),
    "components_suite": (
        "Five iterative variants (label-prop + star-contraction on two "
        "graphs, late-r4 2-core peel) build on concurrent threads over "
        "two persisted inputs — wall-clock is the slowest driver loop, "
        "not the sum — plus the non-iterative r4 triangle variant "
        "(degree-oriented wedge close: two equi-joins, out-degree "
        "bounded O(sqrt E), exact-once). All shuffles key on node id; "
        "results localCheckpoint so the returned union never re-runs "
        "an iteration."
    ),
    "tpch_q1": (
        "Twelve TPC-H shapes in one tagged union. The late-r4 "
        "additions cover the remaining relational idioms: q13's LEFT "
        "join survives into a two-level aggregation, q14/q6 push their "
        "date filters to the lineitem scan, q15's scalar max subquery "
        "broadcasts a 1-row aggregate, q17's correlated per-part "
        "average rides a window over the join key (one scan, one "
        "shuffle — not agg+join-back), q18's HAVING subquery is a "
        "shuffle-side semi input, q22's global-average threshold is an "
        "exact integer cross-multiply against a broadcast 1-row "
        "aggregate with a left_anti on 'F' orders. Dims broadcast "
        "everywhere; fact-side shuffles only on join keys."
    ),
    "decontaminate": (
        "Three tiers, one scan each: exact n-gram (array_distinct "
        "inside the doc kills the pre-explode shuffle, bench gram set "
        "broadcasts), the late-r4 bloom tier (split-block filter as a "
        "bounded broadcast relation probed by equi-join + mask test — "
        "the corpus side is never shuffled before the per-doc count), "
        "and the semantic tier (unit-normalized bench side broadcasts, "
        "corpus streams once). r6: the eval side is CAPPED (first 500 "
        "doc ids / 200 vec ids — eval suites are O(1) in production); "
        "the uncapped corpus/7 framing scaled superlinearly (exponent "
        "1.33 -> 0.79 after the cap, sf1.0 line 21.2s -> 6.6s)."
    ),
    "geo_distance_radius": (
        "Six geo shapes; the late-r4 nn variant is the two-phase exact "
        "nearest join: 3x3 cell explode + equi-join + per-row coverage "
        "certificate (R_safe from the haversine lower bound), with the "
        "uncertified tail re-resolved against a broadcast right side — "
        "the only nested-loop in the plan is that bounded fallback, "
        "never a full cross join."
    ),
    "asof_last_purchase": (
        "As-of join as union+window: ONE shuffle on the key, "
        "last(ignorenulls) carries the latest right row forward. No range "
        "explosion, no per-group Python."
    ),
    "temporal_join": (
        "Point-in-time join, plain and (key, time-bucket) variants in "
        "one tagged union: the plain side is a key equi-join with the "
        "interval predicate as join residual; the bucketed side "
        "explodes dim versions into overlapped buckets so per-group "
        "work is bounded by versions-per-bucket on hot keys. Dangling "
        "open intervals cap at an in-plan 1-row max aggregate."
    ),
    "tpch_suite2": (
        "The TPC-H completion ten (r4): all dims broadcast (30 "
        "BroadcastHashJoin, ZERO SortMergeJoin at this scale), the only "
        "hash exchanges are fact-side groupBys/joins on their keys, and "
        "every BroadcastNestedLoopJoin is a deliberate 1-row scalar "
        "broadcast (the derived-partsupp supplier count; q11's "
        "total/n_parts threshold). The correlated subqueries are "
        "join-rewritten: q2's MIN as a partkey-partitioned window, "
        "q21's double EXISTS as ONE per-order distinct aggregate "
        "(two fewer fact self-joins than the textbook plan)."
    ),
    "graph_bfs": (
        "Pregel-style level loop: each level is one keyed shuffle "
        "(frontier x persisted symmetrized edges) + node-bounded "
        "anti-join against the visited set, with per-level "
        "localCheckpoint lineage truncation and empty-frontier early "
        "stop; the edge relation is persisted once per build. Since r6 "
        "the LABEL FRAME is disk-backed (plans/prepared.py): the level "
        "iteration runs once per source table and the serving plan — "
        "shown below — is a parquet scan of the prepared labels + one "
        "histogram aggregate (fresh-session cold 8.65s -> 2.1s)."
    ),
    "string_suite": (
        "String-function melt + the former urls_chunks_suite branches "
        "(URL canonicalization, sliding-window chunking, markup-to-"
        "prose) — pure Columns, map-only; no shuffle beyond the chunk "
        "window's per-doc explode; scales as a scan."
    ),
    "basket_pairs": (
        "Within-basket self-join keyed on the basket id: the shuffle "
        "moves one row per (basket, item); pair explosion is bounded "
        "by basket size (choose 2), never corpus-quadratic; support "
        "threshold folds into the pair aggregate."
    ),
    "outlier_orders": (
        "Two passes over orders: one grouped DECIMAL(38,0) moment "
        "aggregate broadcast back into a scan-side filter — the 1.5-"
        "sigma gate is the exact cross-multiplied integer inequality, "
        "so no float (and no sqrt/division) appears anywhere in the "
        "plan."
    ),
    "chat_transcripts": (
        "One hash aggregation per user: sort_array over (us, event_id, "
        "line) structs orders each user's turns JVM-side, transform + "
        "array_join renders the transcript — no window, no Python, "
        "one shuffle on user_id."
    ),
    "multimodal_meta": (
        "The media decode surface (r7 adds REAL H.264: avc1 I_PCM "
        "tracks decode through operators/h264.py — NAL unescape, "
        "Exp-Golomb, SPS/PPS with per-slice pic_parameter_set_id "
        "pairing, BT.601 RGB — and their pixel sums ride the hash "
        "oracle). One Arrow-batched mapInPandas over the synthesized "
        "payload frame, then a plain projection melt: binary bytes "
        "cross into Python once per batch, never per row, and nothing "
        "shuffles except the final tagged-union ordering."
    ),
}


def main() -> None:
    spark = get_spark("gen-plans", cpus=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    specs = all_queries()
    out = [
        "# PLANS — annotated physical plans of flagship queries",
        "",
        "Generated by `python tools/gen_plans.py` (AQE disabled for display so the",
        "full static plan is visible; AQE is ON in production/bench). These are the",
        "plans the 100 TB design notes in README.md claim — checked in so reviewers",
        "can diff them, and guarded by tests/test_physical_plans.py.",
        "",
    ]
    for name, note in NOTES.items():
        df = specs[name].fn(spark, SF)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")

    # non-registry flagship: the WebDataset shuffle-free sample reader
    # (r7, sources/tar_shards.py) — written against a real shard dir so
    # the binaryFile scan resolves, then explained like the rest
    import tempfile

    from geoestate_etl_spark.operators.multimodal import make_png
    from geoestate_etl_spark.sources.tar_shards import (
        read_tar_samples,
        write_tar_shards,
    )

    d = tempfile.mkdtemp(prefix="plans_tar_")
    demo = spark.createDataFrame(
        [(f"{i:06d}", bytearray(make_png(4, 4)), f"cap {i}") for i in range(8)],
        "key string, image binary, caption string",
    )
    write_tar_shards(demo, d, 2, member_cols={"png": "image", "txt": "caption"})
    df = read_tar_samples(spark, d)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    out.append(
        "## read_tar_samples (WebDataset shard reader — not a registry "
        "entry)\n\n"
        "Zero Exchange anywhere: samples are assembled DURING the "
        "sequential tar walk (consecutive members of one key form one "
        "sample — the WebDataset contract the writer enforces by "
        "sorting), so the media bytes never move between executors. "
        "Plan-asserted Exchange-free in tests/test_tar_shards.py.\n\n"
        f"```\n{plan.strip()}\n```\n"
    )
    # non-registry flagship: the r9 perceptual Hamming-LSH pair join
    # (operators/phash.py) — shown over a real parquet scan so the
    # pruned ReadSchema and the bucket equi-join are both visible
    from pyspark.sql import functions as F

    from geoestate_etl_spark.operators.phash import phash_near_dups

    sigs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("id"), F.xxhash64("text").alias("phash")
    )
    df = phash_near_dups(sigs, id_col="id")
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    out.append(
        "## phash_near_dups (perceptual Hamming LSH — not a registry "
        "entry; certified via near_dup_pairs' `phash` variant)\n\n"
        "The 64-bit dHash pair finder is an equi-self-join on 8-bit "
        "(band, byte) buckets — complete for Hamming distance <= 7 by "
        "pigeonhole, no CartesianProduct anywhere. Hot buckets above "
        "the occupancy cap are anti-joined out (broadcast) BEFORE the "
        "self-join, and the exact `bit_count(xor)` rescore runs on the "
        "candidate pairs only. The scan reads two columns; the media "
        "pipeline computes the hash inside the ingest decode pass, so "
        "this join's input is always a skinny (id, hash) relation.\n\n"
        f"```\n{plan.strip()}\n```\n"
    )

    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))


if __name__ == "__main__":
    main()
