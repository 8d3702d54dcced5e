"""The main correctness gate, run locally: every declared query with an
oracle must hash-match DuckDB at sf0.01 (same compare discipline as
the driver: column names, row counts, order-insensitive values).
Queries without oracles must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from geoestate_etl_spark.plans import all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_spark_duckdb

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    ok, msg = compare_spark_duckdb(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable, non-empty schema


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
    # The driver verifies the FIRST 50 registry entries only (r2 rule,
    # re-broken in r4 at 56 entries — VERDICT r4 #1). Exactly 50 means
    # every declared capability gets a driver verdict every round; a
    # 51st entry would silently fall outside the verification window.
    assert len(q) == 50, (
        f"registry has {len(q)} entries; the driver verifies exactly the "
        "first 50 — fold new surface into an existing tagged suite "
        "instead of appending past the verification window"
    )
