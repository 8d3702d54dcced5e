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

from geoestate_etl_spark.plans import all_queries
from geoestate_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: every oracled query + the deterministic rows-only ops
#: (sketch/LSH paths) — i.e. the engine's whole declared surface.
SKIP = set()  # keep everything; trim here if a query outgrows the budget


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("geoestate-bench")
    specs = all_queries()

    # warmup: JVM + codegen + parquet footer caches
    force(spark.read.parquet(os.path.join(SF_DIR, "region.parquet")))

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        if name in SKIP:
            continue
        t0 = time.perf_counter()
        force(spec.fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
