"""Benchmark harness: runs the declared headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query's full plan is forced with the noop sink (computes every
operator, no driver collect, no disk write) — the honest way to time
a distributed plan. A tiny warmup query first so JVM/codegen startup
isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd  # module-global: pandas_udf type hints resolve here

from geoestate_etl_spark.plans import all_queries
from geoestate_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: every oracled query + the deterministic rows-only ops
#: (sketch/LSH paths) — i.e. the engine's whole declared surface.
SKIP = set()  # keep everything; trim here if a query outgrows the budget


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_houses_pipeline(
    spark, n_rows: int = 330_000, reps: int = 3, n_files: int = 8
) -> tuple[float, dict]:
    """The reference's own e2e workload at its full-dataset scale
    (~329k valid rows, README.md:95): dirty-CSV ingest → validate →
    renumber → cast → all four analytics → sorted serving write →
    top-25. One number for 'same pipeline, Spark-native'.

    Runs ``reps`` times (cache cleared between reps) and reports the
    MEDIAN with per-stage timings — the r2 driver run regressed +68%
    on a single cold execution that the repo could not reproduce
    (r3 profiling: warm reps 9.7-12.0s vs 42s session-cold), so one
    sample of this line is noise-dominated.

    r8 (VERDICT r7 #1): the single-file layout is a MEASURED scan
    cliff — multiLine CSV is unsplittable, so the whole 330k-row
    UTF-16 parse runs as ONE task (~80% of the line). The same rows
    sharded into ``n_files`` CSVs (the realistic at-scale feed layout)
    run the identical pipeline with file-count parse parallelism; both
    layouts are benched, parity of the outputs is asserted, and the
    headline stays the single-file median for round-over-round
    comparability. The sharded numbers live in the detail record.
    """
    import statistics
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.houses_fixture import generate, generate_sharded

    from geoestate_etl_spark.plans.pipeline import run_pipeline

    d = tempfile.mkdtemp(prefix="bench_houses_")
    fx = generate(os.path.join(d, "houses.csv"), n_rows=n_rows, seed=42)
    fx_m = generate_sharded(
        os.path.join(d, "sharded"), n_rows=n_rows, seed=42, n_files=n_files
    )
    tops: dict[str, list] = {}

    def one_rep(path: str, tag: str, rep: int) -> dict:
        spark.catalog.clearCache()  # comparable reps: no carryover cache
        probe = quick_probe(spark)  # per-rep drift context (r8 #3)
        t0 = time.perf_counter()
        res = run_pipeline(
            spark, path, serving_path=os.path.join(d, f"serving_{tag}{rep}")
        )  # actions inside: validate counts + serving write (materializes clean)
        t1 = time.perf_counter()
        # force every analytics output (the reference's four queries + top25)
        for df in (
            res.year_stats,
            res.top_regions,
            res.top_localities,
            res.min_max_square,
            res.decade_histogram,
        ):
            df.collect()
        top25 = res.top25_by_square.collect()
        t2 = time.perf_counter()
        assert res.n_valid + res.n_invalid == n_rows
        assert res.n_valid == fx.n_valid
        tops.setdefault(tag, []).append(top25)
        return {
            "probe_jvm": probe,
            "ingest_validate_write": round(t1 - t0, 3),
            "analytics": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
        }

    runs = [one_rep(fx.path, "one", r) for r in range(reps)]
    runs_m = [one_rep(fx_m.path, "many", r) for r in range(max(2, reps - 1))]
    # identical results from both layouts — the parallel parse is the
    # same pipeline, not a different one
    assert tops["one"][0] == tops["many"][0]
    median = round(statistics.median(r["total"] for r in runs), 3)
    median_m = round(statistics.median(r["total"] for r in runs_m), 3)
    detail = {
        "reps": runs,
        "median": median,
        "sharded": {
            "n_files": n_files,
            "reps": runs_m,
            "median": median_m,
            "note": (
                "same 330k rows sharded into n_files CSVs; multiLine "
                "CSV parses one task per FILE. Measured (r8, idle "
                "host, noop-forced raw parse): single-file ~0.98s vs "
                "8-file ~0.27s — so at THIS scale the unsplittable "
                "parse is ~1s of the ~6.5s ingest segment (r7's "
                "'~80%' was a hypothesis; the segment is dominated by "
                "validate+renumber+cast+write, which parallelize in "
                "both layouts). The cliff is the SCALING term: one "
                "task grows linearly with file bytes (100x file -> "
                "~100s serial) while the sharded layout rides file-"
                "count parallelism (VERDICT r7 #1)."
            ),
        },
    }
    return median, detail


def quick_probe(spark) -> float:
    """~0.3s single-sample JVM probe (VERDICT r8 #3): the once-per-run
    ``calibration`` captures between-run drift but not throttle that
    develops DURING a 70s+ suite (r8: houses ingest reps rose
    8.7→14.8s while the run-level probe read *faster* than the rested
    run's). One of these interleaved before every e2e rep/sample gives
    each long line its own drift context. Same codegen shape as
    ``jvm_range_agg`` at 1/8 the rows so the ratio to the run-level
    number is directly interpretable (probe ≈ jvm_range_agg / 8 on an
    un-throttled host; a rep whose probe reads 2x that is a throttled
    sample, not a regression)."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(0, 25_000_000).select(
        F.sum((F.col("id") % 1000003) * 2 + 1).alias("s")
    ).collect()
    return round(time.perf_counter() - t0, 3)


def calibration(spark) -> dict:
    """Fixed CPU-bound microbenchmark (VERDICT r7 #5): identical work
    every round, so round-over-round bench deltas can be normalized
    for host drift (totals swung 52-67s across IDENTICAL code, larger
    than a round's real improvement). Two probes, best-of-3 each:

    - ``jvm_range_agg``: 200M-row whole-stage-codegen aggregate across
      all cores — tracks JVM throughput + scheduling under the host's
      current thermal/throttle state.
    - ``numpy_matmul``: a fixed 3000² matmul (~54 GFLOP) — tracks the
      Python/BLAS side the Arrow-batched kernels run on.

    To drift-normalize a per-line delta between rounds, scale by the
    ratio of the rounds' calibration numbers (BENCH_HISTORY does this
    for the headline comparison).
    """
    import numpy as np
    from pyspark.sql import functions as F

    jvm = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000).select(
            F.sum((F.col("id") % 1000003) * 2 + 1).alias("s")
        ).collect()
        jvm.append(time.perf_counter() - t0)
    rng = np.random.default_rng(42)
    a = rng.random((3000, 3000))
    b = rng.random((3000, 3000))
    py = []
    for _ in range(3):
        t0 = time.perf_counter()
        float((a @ b)[0, 0])
        py.append(time.perf_counter() - t0)
    return {
        "jvm_range_agg": round(min(jvm), 3),
        "numpy_matmul": round(min(py), 3),
    }


def bench_corpus_pipeline(spark) -> float:
    """The training-data e2e: quality gate → exact dedup → MinHash
    near-dup removal → PII scrub → token accounting → packing, over
    the documents table. One number for the corpus-pipeline surface."""
    from geoestate_etl_spark.plans.corpus_pipeline import run_corpus

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    t0 = time.perf_counter()
    res = run_corpus(docs, id_col="doc_id", text_col="text")
    force(res.packed)
    res.unpersist()
    return round(time.perf_counter() - t0, 3)


def bench_media_pipeline(spark) -> float:
    """The media twin of corpus_pipeline (r8 — VERDICT r7 #4): landing
    zone → streaming exactly-once decode → decodability gate → exact
    dedup → re-encode (decoded-content) dedup → semantic stage → tar
    shards + tamper audit. The fixture plants every funnel tier and the
    run asserts the PREDICTED funnel, so this line times a verified
    pipeline, not just a plan that finishes. Fresh work dir per call
    (cold checkpoint — the full-backlog ingest is part of the cost)."""
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.media_corpus_fixture import generate_media_landing

    from geoestate_etl_spark.plans.media_pipeline import run_media_corpus

    d = tempfile.mkdtemp(prefix="bench_media_")
    landing = os.path.join(d, "landing")
    pred = generate_media_landing(
        landing, n_unique_png=240, n_wav=40, n_exact_dup=80,
        n_reencode=60, n_resized=50, n_releveled=40, n_junk=20,
    )
    t0 = time.perf_counter()
    res = run_media_corpus(
        spark, landing, os.path.join(d, "work"), n_shards=4
    )
    dt = round(time.perf_counter() - t0, 3)
    assert (
        res.n_files, res.n_decodable, res.n_exact_unique,
        res.n_content_unique, res.n_perceptual_dropped,
        res.n_semantic_dropped, res.n_final,
    ) == (
        pred.n_files, pred.n_decodable, pred.n_exact_unique,
        pred.n_content_unique, pred.n_perceptual_dropped,
        pred.n_semantic_dropped, pred.n_final,
    )
    assert res.audit_ok
    res.unpersist()
    return dt


def bench_paired_pipeline(spark) -> float:
    """The (image, caption) VLM-shape e2e (r9 — VERDICT r8 #4): joint
    admission gate → image edges (exact/re-encode/perceptual) + text
    edges (exact/MinHash near-dup) → union-closure election → paired
    WebDataset shards + audit. 300 planted pairs across every tier;
    the fixture PREDICTS the whole funnel (independent Python dHash +
    MinHash + union-find) and the run asserts it, so this line times a
    verified pipeline."""
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.paired_corpus_fixture import (
        PAIR_SCHEMA,
        generate_paired_rows,
    )

    from geoestate_etl_spark.plans.paired_pipeline import run_paired_corpus

    rows, pred = generate_paired_rows(
        n_base=120, n_img_exact=25, n_img_reenc=20, n_img_resized=20,
        n_img_releveled=15, n_txt_exact=25, n_txt_near=20, n_chain=10,
        n_gate_img=15, n_gate_txt=10,
    )
    d = tempfile.mkdtemp(prefix="bench_paired_")
    pairs = spark.createDataFrame(rows, PAIR_SCHEMA)
    t0 = time.perf_counter()
    res = run_paired_corpus(spark, pairs, os.path.join(d, "shards"), n_shards=4)
    dt = round(time.perf_counter() - t0, 3)
    assert (
        res.n_pairs, res.n_gated, res.n_image_edges, res.n_text_edges,
        res.n_joint_dropped, res.n_final,
    ) == (
        pred.n_pairs, pred.n_gated, pred.n_image_edges, pred.n_text_edges,
        pred.n_joint_dropped, pred.n_final,
    )
    assert res.audit_ok
    res.unpersist()
    return dt


def main() -> None:
    spark = get_spark("geoestate-bench")
    specs = all_queries()

    # warmup: JVM + codegen + parquet footer caches
    force(spark.read.parquet(os.path.join(SF_DIR, "region.parquet")))
    # ... and the Arrow python-worker pool: the first pandas_udf in a
    # session pays worker spawn + numpy/pandas import across all cores
    # (~10s at local[32]); that's session setup, not query cost, so
    # bill it to warmup like the JVM. Workers are reused afterwards.
    from pyspark.sql import functions as _F
    from pyspark.sql import types as _T

    @_F.pandas_udf(_T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    force(
        spark.range(0, spark.sparkContext.defaultParallelism * 10)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(_warm("id"))
    )

    # host-drift calibration AFTER warmup (JVM up, workers spawned) so
    # it measures the host, not session startup
    cal = calibration(spark)

    timings: dict[str, float] = {}

    # Build-once derived artifacts (IVF index) are a separate lifecycle
    # from serving queries — account the build as its own metric so the
    # query timing below measures the probe path, as deployed. Drop any
    # index left by a PRIOR bench run first: otherwise this sample is
    # probe-only and a phantom "build" time gets recorded (review
    # finding — the index cache is keyed by source stats and survives
    # across runs in spark-warehouse/).
    if "similarity_ann" in specs:  # r5: ann_certify folded in here
        import shutil

        from geoestate_etl_spark.plans.queries_ext import (
            _ivf_index_path,
            ensure_warehouse_index,
        )

        shutil.rmtree(_ivf_index_path(SF_DIR, 16), ignore_errors=True)
        t0 = time.perf_counter()
        ensure_warehouse_index(spark, SF_DIR, 16)
        timings["similarity_index_build"] = round(time.perf_counter() - t0, 3)

    # r6: the other prepare-heavy serving state (BFS label frame,
    # PageRank fixpoint, text gram frames) is disk-backed too
    # (plans/prepared.py — VERDICT r5 #3). Same lifecycle accounting
    # as the IVF index: drop any artifacts a prior run left, time the
    # build ONCE as its own metric, then leave them in place so the
    # query loop below measures the deployed cold path — a fresh
    # session reading the prepared store, not re-running iterations.
    _PREPARED_QUERIES = ("graph_bfs", "pagerank_suppliers", "text_metrics")
    _PREPARED_NAMES = (
        "bfs_supplier_order",
        "pagerank_supplier_nation",
        "text_grams",
    )
    if all(q in specs for q in _PREPARED_QUERIES):
        from geoestate_etl_spark.plans.prepared import invalidate_artifacts
        from geoestate_etl_spark.plans.registry import invalidate_prepared

        for n in _PREPARED_NAMES:
            invalidate_artifacts(n)
        t0 = time.perf_counter()
        for qn in _PREPARED_QUERIES:
            force(specs[qn].fn(spark, SF_DIR))
        # reported top-level, NOT summed into the query total: before
        # r6 this cost lived in cold_first_run (also unsummed), so
        # adding it to `queries` would break round-over-round total
        # comparability while the engine actually got faster
        prepare_build = round(time.perf_counter() - t0, 3)
        # those serves cached plans over the fresh artifacts; drop them
        # so pass 1 measures a cold plan build + artifact scan
        for qn in _PREPARED_QUERIES:
            invalidate_prepared(qn)
    else:
        prepare_build = None

    # Two passes, best-of-2 per query: this host's CPU throttling was
    # measured (r3) to swing identical plans 3-5x between runs, and a
    # single sample turns that noise into phantom regressions. The min
    # is the standard noise-robust statistic; pass 2 is skipped if the
    # first pass already blew the time budget (keeps the bench bounded).
    # Pass 1 is COLD per query: it pays plan construction plus any
    # eager prepare-time work (iterative BFS/pagerank label frames,
    # trained tokenizers, checkpointed aggregates). Since r5 the
    # registry serves prepared plans (build once per session, like a
    # prepared statement), so pass 2 measures steady-state serving.
    # Both are reported: `queries` = best-of-2 (the serving cost the
    # total sums), `cold_first_run` = the pass-1 number for any query
    # whose prepare cost is material (> 0.25s over its warm serve).
    cold: dict[str, float] = {}
    t_pass0 = time.perf_counter()
    for name, spec in specs.items():
        if name in SKIP:
            continue
        t0 = time.perf_counter()
        force(spec.fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
        cold[name] = timings[name]
    if time.perf_counter() - t_pass0 < 240:
        for name, spec in specs.items():
            if name in SKIP:
                continue
            t0 = time.perf_counter()
            force(spec.fn(spark, SF_DIR))
            timings[name] = min(
                timings[name], round(time.perf_counter() - t0, 3)
            )
        if "similarity_ann" in specs:
            # best-of-2 for the build line too: drop the materialized
            # index and rebuild (deterministic), same throttle-noise
            # rationale as the query loop — a single cold sample of the
            # Lloyd build swung 2x between otherwise-identical runs
            import shutil

            from geoestate_etl_spark.plans.queries_ext import (
                _ivf_index_path,
                ensure_warehouse_index,
            )

            shutil.rmtree(_ivf_index_path(SF_DIR, 16), ignore_errors=True)
            t0 = time.perf_counter()
            ensure_warehouse_index(spark, SF_DIR, 16)
            timings["similarity_index_build"] = min(
                timings["similarity_index_build"],
                round(time.perf_counter() - t0, 3),
            )
            # the rebuild REPLACED the index files the prepared plan
            # already listed — invalidate so the variant loop below
            # rebuilds the plan against the fresh listing
            from geoestate_etl_spark.plans.registry import (
                invalidate_prepared,
            )

            invalidate_prepared("similarity_ann")

    # Per-variant sub-timings for the tagged-union suites (r3 verdict
    # #5): absorbed variants were indistinguishable from regressions in
    # the one-number-per-suite trend. Filtering the union on its tag
    # literal constant-folds every other branch away (lit('a')='b' →
    # false → the branch's scan is pruned), so each sample times that
    # variant's real plan. Informational only — NOT added to the total
    # (the suite line still times the full union).
    # Tag values are static properties of each suite (literals in the
    # plan) — enumerating them here avoids a full discovery execution
    # per suite (r4 review finding). Caveat recorded for auditors:
    # vocab_suite's samples each include the shared eager vocab build
    # (it runs at fn() time regardless of variant), so its per-variant
    # numbers are build + variant; the BPE driver training likewise.
    # Trends per variant remain comparable (the shared cost is a
    # common additive term).
    VARIANT_SUITES = {
        "event_windows_suite": (
            "kind",
            ["funnel", "resample", "retention", "session", "sliding", "tumbling"],
        ),
        "geo_distance_radius": ("kind", ["grid", "nn", "pip", "point", "radius", "topk"]),
        "vocab_suite": (
            "variant",
            ["bpe", "encode", "mix", "pack", "unigram", "vocab"],
        ),
        "status_extrema": (
            "kind",
            # rf_cnt stands in for the 9 former-returnflag_stats melt
            # kinds (they share one wide-agg sub-plan; timing each melt
            # row would re-time the same aggregation 9x)
            ["argmax", "argmin", "boolbit", "cond", "top3", "rf_cnt"],
        ),
        "window_rank_suite": ("kind", ["rank", "frame"]),
        "tpch_q1": (
            "kind",
            ["q1", "q3", "q5", "q6", "q7", "q10", "q13", "q14", "q15", "q17", "q18", "q22"],
        ),
        "tpch_suite2": (
            "kind",
            ["q2", "q4", "q8", "q9", "q11", "q12", "q16", "q19", "q20", "q21"],
        ),
        # decontaminate/dedup branches are lazy unions, so the tag
        # filter prunes the other tiers' plans; ann_certify's samples
        # each still pay the eager pq_train/index-ensure at fn() time
        # (the vocab_suite caveat above applies)
        "decontaminate": ("kind", ["ngram", "bloom", "semantic"]),
        "dedup_exact_suite": ("kind", ["exact", "keyed", "span"]),
        # r5 folds: urls/chunks kinds live in string_suite, the
        # ann-certification variants in similarity_ann
        "string_suite": ("kind", ["url", "chunk", "html"]),
        "similarity_ann": (
            "method",
            ["lsh", "ivf", "hybrid", "exact", "ivf_full", "lsh_cand", "pq_adc"],
        ),
    }
    from pyspark.sql import functions as _Fv

    variants: dict[str, dict[str, float]] = {}
    for name, (tag, tags) in VARIANT_SUITES.items():
        if name not in specs or name in SKIP:
            continue
        # Warm the suite's prepared plan before sampling (VERDICT r7
        # #6): similarity_ann's plan was invalidated by the index
        # rebuild above, so its FIRST variant (lsh) absorbed the whole
        # 7-branch union's plan-build + eager-checkpoint cost (5.3s
        # recorded for a 0.3s serving path). One untimed force makes
        # every variant sample the tag-filtered SERVING cost.
        force(specs[name].fn(spark, SF_DIR))
        variants[name] = {}
        for v in tags:
            t0 = time.perf_counter()
            force(specs[name].fn(spark, SF_DIR).filter(_Fv.col(tag) == v))
            variants[name][v] = round(time.perf_counter() - t0, 3)

    houses_median, houses_detail = bench_houses_pipeline(spark)
    timings["houses_pipeline_330k"] = houses_median
    # best-of-2, same rationale as the query loop (cold-run codegen +
    # host throttle dominate a single sample; warm steady-state is the
    # honest pipeline cost) — second run under the same time guard
    # UNCONDITIONAL best-of-2 for the two e2e lines (r8): the old
    # time-budget guard measured elapsed time from pass-1's start,
    # which the two passes + variants always exhaust by now — so both
    # lines silently degraded to one cold sample (media_pipeline
    # recorded 31.4s for a ~14s line). The second sample costs ~20s
    # of bench wall and removes the single-cold-sample noise the
    # best-of-2 design exists to remove.
    def _e2e_samples(fn, n: int = 2) -> tuple[float, list[dict]]:
        # per-sample drift probe (r8 #3): each sample records the host
        # state it ran under, so a slow sample with a slow probe reads
        # as throttle, and one with a fast probe reads as a real cost
        samples = []
        for _ in range(n):
            probe = quick_probe(spark)
            samples.append({"probe_jvm": probe, "total": fn(spark)})
        return min(s["total"] for s in samples), samples

    timings["corpus_pipeline"], corpus_detail = _e2e_samples(
        bench_corpus_pipeline
    )
    # r8: the media e2e line (predicted-funnel-verified); each run
    # pays a cold checkpoint by design.
    timings["media_pipeline"], media_detail = _e2e_samples(
        bench_media_pipeline
    )
    # r9: the (image, caption) joint-dedup e2e (predicted-funnel-
    # verified, VERDICT r8 #4)
    timings["paired_pipeline"], paired_detail = _e2e_samples(
        bench_paired_pipeline
    )

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    cold_material = {
        k: v
        for k, v in cold.items()
        if k in timings and v - timings[k] > 0.25
    }
    full = {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "variants": variants,
        "cold_first_run": cold_material,
        "prepare_artifacts_build": prepare_build,
        "houses_pipeline_330k_detail": houses_detail,
        "corpus_pipeline_detail": corpus_detail,
        "media_pipeline_detail": media_detail,
        "paired_pipeline_detail": paired_detail,
        "calibration": cal,
        "probe_note": (
            "probe_jvm is a ~0.3s single-sample interleaved drift probe "
            "(same codegen shape as calibration.jvm_range_agg at 1/8 "
            "rows); compare a rep's probe to calibration.jvm_range_agg/8 "
            "to tell throttle from regression (VERDICT r8 #3)"
        ),
        "variants_note": (
            "each variant sample times the tag-filtered PREPARED suite "
            "plan (plan warmed untimed before the loop); suites with "
            "eager fn()-time builds (vocab_suite, similarity_ann "
            "certify) still include that shared cost as a common "
            "additive term"
        ),
    }
    print(json.dumps(full))
    # r7 (VERDICT r6 #1): the full line above is large enough that the
    # driver's tail-capture truncates it, leaving BENCH_r{N} with
    # "parsed": null. Persist the complete record to a committed file
    # and END stdout with a compact self-contained JSON summary line
    # small enough to always survive tail capture.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # r10 (VERDICT r9 #3): the summary used to print only the top-10
    # lines by time, so a line that merely got FASTER left the dict and
    # read as "dropped_from_bench" to the round-over-round differ. The
    # final line now enumerates EVERY line (sorted by time, rounded) —
    # ~1.5 KB, still far under the driver's tail-capture window.
    by_time = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": total,
                "unit": "sec",
                "sf": full["sf"],
                "n_queries": len(timings),
                "queries": {k: round(v, 3) for k, v in by_time.items()},
                "queries_note": "ALL lines, sorted by time; details in bench_out.json",
                "prepare_artifacts_build": prepare_build,
                "calibration": cal,
                "full_record": "bench_out.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
