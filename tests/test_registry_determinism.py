"""Registry-wide execution determinism: every declared query must
produce the IDENTICAL row multiset when built and executed twice in
one session (sf0.001). This is the gate for the bug class r5 found in
the wild — per-execution range-boundary resampling emitting duplicate
ids — and for cache coupling (a query whose second run silently reads
another query's leftover state would differ or crash here)."""

from __future__ import annotations

import pytest

from geoestate_etl_spark.plans import all_queries
from tests.conftest import SF_SMOKE

SPECS = all_queries()


def _rows(spark, name):
    df = SPECS[name].fn(spark, SF_SMOKE)
    return sorted(map(str, (tuple(r) for r in df.collect())))


@pytest.mark.parametrize("name", sorted(SPECS))
def test_twice_identical(spark, name):
    first = _rows(spark, name)
    second = _rows(spark, name)
    assert first == second, (
        f"{name}: two executions in one session disagree "
        f"({len(first)} vs {len(second)} rows; first diff: "
        f"{next((a, b) for a, b in zip(first, second) if a != b) if len(first) == len(second) else 'row-count'})"
    )
