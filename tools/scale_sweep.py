"""Multi-sf scaling sweep (r6 — VERDICT r5 #4).

Times the most expensive bench lines at sf0.1 (driver testdata) and
the locally-synthesized sf0.3 / sf1.0 (tools/gen_scale.py), fits a
per-line scaling exponent b from t = a·sf^b by least squares over
log-log points, and prints one JSON blob for BENCH_HISTORY.

Serving times are best-of-2 after a cold build pass (the bench
discipline); one-time lifecycle builds (IVF index, prepared
artifacts) are timed separately per sf, since their growth matters as
much as the serving path's. An exponent ≈1 means linear in corpus
size, <1 sublinear (bounded heads / pruned scans), >1 superlinear —
the pair-generating suspects the sweep exists to catch.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

import pandas as pd  # module scope: pandas_udf type-hint resolution

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # runnable from any cwd

SFS = [
    ("/root/testdata/sf0.1", 0.1),
    (os.path.join(REPO, "data", "scale", "sf0.3"), 0.3),
    (os.path.join(REPO, "data", "scale", "sf1.0"), 1.0),
]

#: r7 (VERDICT r6 #3): `python tools/scale_sweep.py sf3` extends the
#: sweep one more decade for the corpus-proportional lines (the ones
#: whose r6 exponents were ~1 by nature) — four points sf0.1→sf3.0,
#: restricted to these lines so the run stays bounded. Also runs the
#: corpus_pipeline e2e at every point with the sf3 funnel RE-PREDICTED
#: from the generator's planted near-dup density (see _funnel_check).
SF3_DIR = os.path.join(REPO, "data", "scale", "sf3.0")
SF3_LINES = [
    "text_metrics",
    "near_dup_pairs",
    "string_suite",
    "dedup_exact_suite",
]

LINES = [
    "near_dup_pairs",
    "basket_pairs",
    "geo_distance_radius",
    "tpch_suite2",
    "string_suite",
    "decontaminate",
    "renumber_parity",
    "text_metrics",
    "tpch_q1",
    "vocab_suite",
    "semantic_dedup",
    "similarity_ann",
    "dedup_exact_suite",
    "event_windows_suite",
    "graph_bfs",
    "pagerank_suppliers",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _funnel_check(spark, sf_dir: str, res) -> dict:
    """Re-predict the sf3 corpus funnel from the generator's planted
    structure (tools/gen_scale.py) and compare to the observed counts.

    The generator plants, per 10 ids: id%10==7 = one-word mutation of
    id-7, id%10==9 = prefix-token duplicate of id-9 (both bases are
    id%10==0 docs; no chains). No embeddings/benchmark are passed and
    span dedup is off, so the funnel prediction is:

    - n_input exact;
    - EXACT drops = planted mutations whose random replacement word
      drew the ORIGINAL word (P = 1/|vocab| per mutation — the first
      sf3 run measured 480 such docs in 150k, matching ~15k/30), i.e.
      gated planted docs whose text EQUALS the base's text;
    - NEAR drops = gated planted pairs whose TRUE shingle-Jaccard
      clears the rescore threshold (computed with the engine's own
      shingle_ids expression — the same definition the pipeline
      rescore uses) MINUS the text-equal ones (those already left at
      the exact tier), discounted by LSH band recall (>= 0.97 at
      j = 0.7 for 24 hashes in 8 bands)."""
    from pyspark.sql import functions as F

    from geoestate_etl_spark.operators.dedup import shingle_ids
    from geoestate_etl_spark.plans.corpus_pipeline import quality_gate

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_input = docs.count()
    gated = docs.filter(quality_gate("text")).select(
        "doc_id", "text", shingle_ids("text").alias("sh")
    )
    planted = gated.filter(F.col("doc_id") % 10 == 0).alias("b")
    pairs = None
    for off in (7, 9):
        m = (
            gated.filter((F.col("doc_id") % 10 == off) & (F.col("doc_id") >= off))
            .withColumn("base_id", F.col("doc_id") - off)
            .alias("m")
        )
        j = m.join(planted, F.col("m.base_id") == F.col("b.doc_id")).select(
            F.col("m.doc_id").alias("id"),
            F.col("b.doc_id").alias("base"),
            (F.col("m.text") == F.col("b.text")).alias("equal"),
            (
                F.size(F.array_intersect("m.sh", "b.sh"))
                / F.greatest(F.size(F.array_union("m.sh", "b.sh")), F.lit(1))
            ).alias("jac"),
        )
        pairs = j if pairs is None else pairs.unionByName(j)
    agg = pairs.agg(
        F.count(F.when(F.col("equal"), 1)).alias("n_equal"),
        F.count(F.when((~F.col("equal")) & (F.col("jac") >= 0.7), 1)).alias(
            "n_near"
        ),
    ).collect()[0]
    predicted_exact, predicted_near = agg.n_equal, agg.n_near
    observed_near = res.n_exact_unique - res.n_near_unique
    exact_drops = res.n_gated - res.n_exact_unique
    report = {
        "n_input": n_input,
        "n_gated": res.n_gated,
        "exact_drops_observed": exact_drops,
        "exact_drops_predicted": predicted_exact,
        "near_drops_observed": observed_near,
        "near_drops_predicted": predicted_near,
        "near_recall_vs_prediction": round(
            observed_near / max(predicted_near, 1), 4
        ),
    }
    assert res.n_input == n_input, report
    # exact tier: text-equal planted docs, plus vanishingly-rare
    # random collisions (two 8-word docs from a ~30-word vocab)
    assert abs(exact_drops - predicted_exact) <= 5, report
    # near tier: rescore kills every band false-positive, so observed
    # can exceed the base-pair prediction only via sibling edges
    # (mutation ~ prefix-dup of one base, a <=2-shingle delta: tiny
    # margin); banding recall at j>=0.7 is >=0.97
    assert (
        0.9 * predicted_near - 5
        <= observed_near
        <= 1.02 * predicted_near + 5
    ), report
    return report


#: r9 (VERDICT r8 #2): `python tools/scale_sweep.py media` sweeps the
#: media-pipeline e2e across 1x/3x/10x landing zones (1x = the bench
#: tier's 530 files), with the funnel PREDICTED by the fixture at
#: every tier and asserted against the observation — the same
#: predicted-funnel discipline as the corpus sf3 run. Each sample is a
#: cold checkpoint + fresh work dir (the bench-line semantics), best
#: of 2 per tier; a quick JVM probe before each sample records the
#: host drift context (VERDICT r8 #3).
MEDIA_TIERS = (1, 3, 10)
MEDIA_BASE = dict(
    n_unique_png=240, n_wav=40, n_exact_dup=80,
    n_reencode=60, n_resized=50, n_releveled=40, n_junk=20,
)


def _quick_probe(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(0, 25_000_000).select(
        F.sum((F.col("id") % 1000003) * 2 + 1).alias("s")
    ).collect()
    return round(time.perf_counter() - t0, 3)


def media_sweep(spark) -> dict:
    import tempfile

    from tests.media_corpus_fixture import generate_media_landing

    from geoestate_etl_spark.plans.media_pipeline import run_media_corpus

    # untimed warmup run at 1/4 tier size: the FIRST media pipeline in
    # a session pays streaming-engine, binaryFile-source, CC-operator
    # and tar-writer first-use costs that bench.py's media line never
    # sees (it runs after the full query suite). Without this the 1x
    # tier absorbed ~35s of session setup and read ABOVE the 3x tier.
    # Every timed tier then measures the same shape: cold checkpoint +
    # fresh landing zone, warm session.
    wd = tempfile.mkdtemp(prefix="sweep_media_warm_")
    wl = os.path.join(wd, "landing")
    generate_media_landing(
        wl, **{k: max(v // 4, 1) for k, v in MEDIA_BASE.items()}
    )
    run_media_corpus(spark, wl, os.path.join(wd, "work"), n_shards=2
                     ).unpersist()
    shutil.rmtree(wd, ignore_errors=True)

    tiers: dict[str, dict] = {}
    for m in MEDIA_TIERS:
        d = tempfile.mkdtemp(prefix=f"sweep_media_{m}x_")
        landing = os.path.join(d, "landing")
        pred = generate_media_landing(
            landing, **{k: v * m for k, v in MEDIA_BASE.items()}
        )
        samples = []
        for rep in range(2):
            probe = _quick_probe(spark)
            t0 = time.perf_counter()
            res = run_media_corpus(
                spark, landing, os.path.join(d, f"work{rep}"),
                n_shards=4 * m,
            )
            dt = round(time.perf_counter() - t0, 3)
            observed = (
                res.n_files, res.n_decodable, res.n_exact_unique,
                res.n_content_unique, res.n_perceptual_dropped,
                res.n_semantic_dropped, res.n_final,
            )
            expected = (
                pred.n_files, pred.n_decodable, pred.n_exact_unique,
                pred.n_content_unique, pred.n_perceptual_dropped,
                pred.n_semantic_dropped, pred.n_final,
            )
            assert observed == expected, (m, observed, expected)
            assert res.audit_ok
            res.unpersist()
            samples.append({"probe_jvm": probe, "total": dt})
        tiers[str(m)] = {
            "n_files": pred.n_files,
            "funnel": {
                "decodable": pred.n_decodable,
                "exact_unique": pred.n_exact_unique,
                "content_unique": pred.n_content_unique,
                "perceptual_dropped": pred.n_perceptual_dropped,
                "final": pred.n_final,
            },
            "samples": samples,
            "best": min(s["total"] for s in samples),
        }
        shutil.rmtree(d, ignore_errors=True)
    xs = [math.log(m) for m in MEDIA_TIERS]
    ys = [math.log(tiers[str(m)]["best"]) for m in MEDIA_TIERS]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    return {"tiers": tiers, "exponent": round(b, 2)}


#: r9: `python tools/scale_sweep.py paired` sweeps the (image,
#: caption) paired-dedup e2e across 1x/3x/10x pair corpora (1x = the
#: bench tier's 300 pairs), the joint funnel — including exact edge
#: counts — PREDICTED by the fixture's independent Python
#: dHash/MinHash/union-find at every tier and asserted. Same
#: discipline as the media sweep: untimed warmup, best-of-2, per-
#: sample drift probes.
PAIRED_TIERS = (1, 3, 10)
PAIRED_BASE = dict(
    n_base=120, n_img_exact=25, n_img_reenc=20, n_img_resized=20,
    n_img_releveled=15, n_txt_exact=25, n_txt_near=20, n_chain=10,
    n_gate_img=15, n_gate_txt=10,
)


def paired_sweep(spark) -> dict:
    import tempfile

    from tests.paired_corpus_fixture import (
        PAIR_SCHEMA,
        generate_paired_rows,
    )

    from geoestate_etl_spark.plans.paired_pipeline import run_paired_corpus

    def run_tier(m: int, shards_dir: str):
        rows, pred = generate_paired_rows(
            **{k: v * m for k, v in PAIRED_BASE.items()}
        )
        pairs = spark.createDataFrame(rows, PAIR_SCHEMA)
        t0 = time.perf_counter()
        res = run_paired_corpus(spark, pairs, shards_dir, n_shards=4 * m)
        dt = round(time.perf_counter() - t0, 3)
        observed = (
            res.n_pairs, res.n_gated, res.n_image_edges,
            res.n_text_edges, res.n_joint_dropped, res.n_final,
        )
        expected = (
            pred.n_pairs, pred.n_gated, pred.n_image_edges,
            pred.n_text_edges, pred.n_joint_dropped, pred.n_final,
        )
        assert observed == expected, (m, observed, expected)
        assert res.audit_ok
        res.unpersist()
        return dt, pred

    # untimed warmup (CC operator, tar writer, Arrow pools)
    wd = tempfile.mkdtemp(prefix="sweep_paired_warm_")
    run_tier(1, os.path.join(wd, "shards"))
    shutil.rmtree(wd, ignore_errors=True)

    tiers: dict[str, dict] = {}
    for m in PAIRED_TIERS:
        d = tempfile.mkdtemp(prefix=f"sweep_paired_{m}x_")
        samples = []
        for rep in range(2):
            probe = _quick_probe(spark)
            dt, pred = run_tier(m, os.path.join(d, f"shards{rep}"))
            samples.append({"probe_jvm": probe, "total": dt})
        tiers[str(m)] = {
            "n_pairs": pred.n_pairs,
            "funnel": {
                "gated": pred.n_gated,
                "image_edges": pred.n_image_edges,
                "text_edges": pred.n_text_edges,
                "joint_dropped": pred.n_joint_dropped,
                "final": pred.n_final,
            },
            "samples": samples,
            "best": min(s["total"] for s in samples),
        }
        shutil.rmtree(d, ignore_errors=True)
    xs = [math.log(m) for m in PAIRED_TIERS]
    ys = [math.log(tiers[str(m)]["best"]) for m in PAIRED_TIERS]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    return {"tiers": tiers, "exponent": round(b, 2)}


def main() -> None:
    from geoestate_etl_spark.plans.corpus_pipeline import run_corpus
    from geoestate_etl_spark.plans.prepared import invalidate_artifact_key
    from geoestate_etl_spark.plans.queries_ext import (
        _ivf_index_path,
        ensure_warehouse_index,
    )
    from geoestate_etl_spark.plans.registry import all_queries, invalidate_prepared
    from geoestate_etl_spark.session import get_spark

    sf3_mode = len(sys.argv) > 1 and sys.argv[1] == "sf3"
    media_mode = len(sys.argv) > 1 and sys.argv[1] == "media"
    paired_mode = len(sys.argv) > 1 and sys.argv[1] == "paired"
    sfs = SFS + [(SF3_DIR, 3.0)] if sf3_mode else SFS
    lines = SF3_LINES if sf3_mode else LINES

    spark = get_spark("scale-sweep")
    specs = all_queries()

    # bench-style warmup: JVM/codegen plus the Arrow python-worker
    # pool, so the first sf's lines aren't billed session setup
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    force(spark.read.parquet(os.path.join(SFS[0][0], "region.parquet")))

    @F.pandas_udf(T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    force(
        spark.range(0, spark.sparkContext.defaultParallelism * 10)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(_warm("id"))
    )

    if media_mode:
        print(json.dumps({
            "media_sweep": media_sweep(spark),
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        }))
        return
    if paired_mode:
        print(json.dumps({
            "paired_sweep": paired_sweep(spark),
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        }))
        return

    results: dict[str, dict[str, float]] = {}

    def put(line: str, sf: float, secs: float) -> None:
        results.setdefault(line, {})[str(sf)] = round(secs, 3)

    funnel_report = None
    for sf_dir, sf in sfs:
        if not sf3_mode:
            # lifecycle builds, timed per sf like the bench does
            shutil.rmtree(_ivf_index_path(sf_dir, 16), ignore_errors=True)
            t0 = time.perf_counter()
            ensure_warehouse_index(spark, sf_dir, 16)
            put("similarity_index_build", sf, time.perf_counter() - t0)

        prep = (
            (("text_grams", ["documents"], "text_metrics"),)
            if sf3_mode
            else (
                ("bfs_supplier_order", ["lineitem"], "graph_bfs"),
                ("pagerank_supplier_nation", ["supplier"], "pagerank_suppliers"),
                ("text_grams", ["documents"], "text_metrics"),
            )
        )
        for name, srcs, _q in prep:
            invalidate_artifact_key(sf_dir, name, srcs)
        t0 = time.perf_counter()
        for _n, _s, qn in prep:
            force(specs[qn].fn(spark, sf_dir))
        put("prepare_artifacts_build", sf, time.perf_counter() - t0)
        for _n, _s, qn in prep:
            invalidate_prepared(qn)

        for name in lines:
            t0 = time.perf_counter()
            force(specs[name].fn(spark, sf_dir))
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            force(specs[name].fn(spark, sf_dir))
            put(name, sf, min(cold, time.perf_counter() - t0))

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        t0 = time.perf_counter()
        res = run_corpus(docs, id_col="doc_id", text_col="text")
        force(res.packed)
        put("corpus_pipeline", sf, time.perf_counter() - t0)
        if sf3_mode and sf == 3.0:
            # funnel re-predicted from the generator's planted density
            funnel_report = _funnel_check(spark, sf_dir, res)
        res.unpersist()

    out = {}
    for line, by_sf in results.items():
        pts = [
            (math.log(sf), math.log(max(by_sf[str(sf)], 1e-3)))
            for _, sf in sfs
            if str(sf) in by_sf
        ]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        out[line] = {"times": by_sf, "exponent": round(b, 2)}
    blob = {"scale_sweep": out, "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}
    if funnel_report is not None:
        blob["sf3_corpus_funnel"] = funnel_report
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
