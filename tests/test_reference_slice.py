"""E2E parity on the REFERENCE'S OWN sample data
(`/root/reference/data/russian_houses_slice.csv`, read-only): the
pipeline must reproduce the dirty-data rates measured in BASELINE.md
and a result narrative consistent with the reference's published
output (README.md:85-103: Москва most represented; Красноярский край
holds the largest square; years from the late 1700s)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.cleaning import strip_to_digits
from geoestate_etl_spark.plans.pipeline import run_pipeline
from geoestate_etl_spark.schema import HOUSES_RAW_SCHEMA
from geoestate_etl_spark.sources.csv_source import read_dirty_csv

SLICE = "/root/reference/data/russian_houses_slice.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SLICE), reason="reference slice not present"
)


@pytest.fixture(scope="module")
def result(spark):
    return run_pipeline(spark, SLICE)


def test_slice_counts(result):
    # 7,120 data rows (BASELINE.md); 5,333 survive the reference's
    # validation semantics (pinned from this engine's first run — the
    # reference publishes per-defect rates, not the joint count).
    # Verified stable under the EXACT reference text-required set
    # (dags/main.py:189-194 — no full_address): the slice has no row
    # whose validity hinges on full_address.
    assert result.n_valid + result.n_invalid == 7120
    assert result.n_valid == 5333


def test_slice_renumber_dense(result):
    """Regression (r5): on THIS data + the test session's local[8],
    renumber_scalable's old repartitionByRange formulation produced
    duplicate ids (5288 distinct of 5333, max 5376) — the offsets job
    and the output job materialized the range exchange separately and
    the boundary sampling re-ran differently for each. The frozen-
    boundary bucketing must yield exactly 1..n_valid."""
    ids = sorted(r.house_id for r in result.clean.select("house_id").collect())
    assert ids == list(range(1, 5334))


def test_slice_defect_rates(spark):
    """The per-column rates BASELINE.md measured on the raw CSV."""
    raw = read_dirty_csv(spark, SLICE, schema=HOUSES_RAW_SCHEMA).cache()
    blank = lambda c: F.col(c).isNull() | (F.trim(c) == "")
    assert raw.filter(blank("latitude")).count() == 53
    assert raw.filter(blank("population")).count() == 104
    assert raw.filter(blank("region")).count() == 72
    # 895 rows remain non-4-digit AFTER digit-strip ("1 903 г" repairs
    # to 1903; BASELINE's 904 counted raw text before stripping)
    bad_year = ~F.coalesce(
        strip_to_digits("maintenance_year").rlike("^[0-9]{4}$"), F.lit(False)
    )
    assert raw.filter(bad_year).count() == 895


def test_slice_analytics_narrative(result):
    years = result.year_stats.collect()[0]
    assert years.avg_year == 1970.71 and years.median_year == 1971.0

    top = result.top_regions.collect()
    assert top[0].region == "Москва" and top[0].cnt == 305  # README.md:95-103

    top25 = result.top25_by_square.collect()
    assert top25[0].region == "Красноярский край"
    assert top25[0].square == 270929.0
    squares = [r.square for r in top25]
    assert squares == sorted(squares, reverse=True) and len(squares) == 25

    decades = {r.decade for r in result.decade_histogram.collect()}
    assert min(decades) == 1790 and max(decades) <= 2020  # 1798-2014 range


def test_artifact_fallback_matches_csv_pipeline(spark, result):
    """The reference-less fallback inside q_houses_slice_top25 (stages
    over the committed raw artifact) must produce exactly the same
    top-25 as the UTF-16 CSV pipeline — guarantees the oracle stays
    comparable in environments without /root/reference."""
    from geoestate_etl_spark.operators.transforms import cast_houses
    from geoestate_etl_spark.plans.pipeline import top25_stage, validate_stage

    raw = spark.read.parquet(
        "/root/repo/data/derived/houses_slice_raw.parquet"
    ).drop("_row_idx")
    validated, nv, ni = validate_stage(raw)
    assert (nv, ni) == (5333, 1787)
    top = top25_stage(cast_houses(validated))
    assert [tuple(r) for r in top.collect()] == [
        tuple(r) for r in result.top25_by_square.collect()
    ]
