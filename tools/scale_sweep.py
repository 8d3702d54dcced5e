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


def main() -> None:
    from geoestate_etl_spark.plans.corpus_pipeline import run_corpus
    from geoestate_etl_spark.plans.prepared import invalidate_artifact_key
    from geoestate_etl_spark.plans.queries_ext import (
        _ivf_index_path,
        ensure_warehouse_index,
    )
    from geoestate_etl_spark.plans.registry import all_queries, invalidate_prepared
    from geoestate_etl_spark.session import get_spark

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

    results: dict[str, dict[str, float]] = {}

    def put(line: str, sf: float, secs: float) -> None:
        results.setdefault(line, {})[str(sf)] = round(secs, 3)

    for sf_dir, sf in SFS:
        # lifecycle builds, timed per sf like the bench does
        shutil.rmtree(_ivf_index_path(sf_dir, 16), ignore_errors=True)
        t0 = time.perf_counter()
        ensure_warehouse_index(spark, sf_dir, 16)
        put("similarity_index_build", sf, time.perf_counter() - t0)

        for name, srcs in (
            ("bfs_supplier_order", ["lineitem"]),
            ("pagerank_supplier_nation", ["supplier"]),
            ("text_grams", ["documents"]),
        ):
            invalidate_artifact_key(sf_dir, name, srcs)
        t0 = time.perf_counter()
        for qn in ("graph_bfs", "pagerank_suppliers", "text_metrics"):
            force(specs[qn].fn(spark, sf_dir))
        put("prepare_artifacts_build", sf, time.perf_counter() - t0)
        for qn in ("graph_bfs", "pagerank_suppliers", "text_metrics"):
            invalidate_prepared(qn)

        for name in LINES:
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
        res.unpersist()
        put("corpus_pipeline", sf, time.perf_counter() - t0)

    xs = [math.log(sf) for _, sf in SFS]
    out = {}
    for line, by_sf in results.items():
        ys = [math.log(max(by_sf[str(sf)], 1e-3)) for _, sf in SFS]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        out[line] = {"times": by_sf, "exponent": round(b, 2)}
    print(json.dumps({"scale_sweep": out, "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}))


if __name__ == "__main__":
    main()
