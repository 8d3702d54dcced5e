"""Standalone pipeline CLI — the reference's Airflow DAG trigger,
as one command:

    python -m geoestate_etl_spark CSV_PATH OUT_DIR [--encoding UTF-16]

Runs the full clean→validate→renumber→cast→analytics→serve pipeline
(plans/pipeline.py) and prints the reference's report surface: valid/
invalid counts, year stats, top regions/localities, min/max square,
decade histogram, top-25 by square.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="geoestate_etl_spark")
    ap.add_argument("csv_path")
    ap.add_argument("out_dir")
    ap.add_argument("--encoding", default="UTF-16")
    ap.add_argument("--top-show", type=int, default=25)
    args = ap.parse_args()

    from geoestate_etl_spark.plans.pipeline import run_pipeline
    from geoestate_etl_spark.session import get_spark

    spark = get_spark("geoestate-pipeline")
    res = run_pipeline(
        spark, args.csv_path, serving_path=args.out_dir, encoding=args.encoding
    )
    print(json.dumps({"valid": res.n_valid, "invalid": res.n_invalid}))
    res.year_stats.show()
    res.top_regions.show(10, truncate=False)
    res.top_localities.show(10, truncate=False)
    res.min_max_square.show(20, truncate=False)
    res.decade_histogram.show(30)
    res.top25_by_square.show(args.top_show, truncate=False)


if __name__ == "__main__":
    main()
