"""Dump `.explain("formatted")` for every registry query to
``plans/r10/<name>_<suffix>.txt`` (r10 optimization-round evidence).

Run from the repo root:

    python tools/dump_plans_r10.py after          # or: before
    python tools/dump_plans_r10.py after text_metrics graph_bfs

Same capture discipline as r9 (tools/dump_plans_r09.py): bench scale
($SPARK_GRAFT_SF_DIR, default sf0.1), bench session (AQE on), initial
plans — the plan-shape facts cited in OPTIMIZATION_r10.md (Exchange
count, join strategy, PushedFilters/ReadSchema, codegen spans,
*EvalPython nodes) are all visible there.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoestate_etl_spark.plans import all_queries
from geoestate_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    only = set(sys.argv[2:])  # optional: dump just these queries
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump-plans-r10")
    for name, spec in all_queries().items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
