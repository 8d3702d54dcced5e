"""Float-output discipline for oracled queries (VERDICT r2 #7).

``round(aggregate_of_money, k)`` re-rounds are cross-engine hash
coin-flips: money sums land on short decimal representations, and
Spark (BigDecimal HALF_UP on the shortest repr) and DuckDB (binary
scale-and-round) disagree exactly on ``.xx5`` reprs (~0.5% of exact
3-decimal values, measured r3). Such columns must travel as scaled
BIGINTs (cents / 1e-4 / 1e-6 units) built from per-row round-to-integer
— round-to-integer agrees between the engines on every double.

A double output column is allowed ONLY in the safe classes:
- raw passthrough of a stored column (identical bits on both sides)
- sums of integer-valued doubles (exact in binary)
- "messy-repr" values — quotients/products of already-inexact doubles
  (cosines, ln terms, len ratios, haversine, variance moments) whose
  shortest repr essentially never terminates at the rounding cut.

Every allowed (query, column) pair is listed here explicitly so adding
a new rounded money aggregate fails this test until it is either
converted to fixed-point or consciously allowlisted.
"""

from __future__ import annotations

import pytest

from geoestate_etl_spark.plans import all_queries
from tests.conftest import SF_ORACLE

#: (query, column) double outputs that are cross-engine-safe by class.
ALLOWED_DOUBLES = {
    # raw passthrough
    ("filter_project", "l_quantity"),
    ("filter_project", "l_extendedprice"),
    ("filtered_topk", "o_totalprice"),
    ("minmax_by_group", "max_price"),   # min/max select stored values
    ("minmax_by_group", "min_price"),
    ("upsert_customers", "c_acctbal"),  # stored value (+1000.0 exact)
    ("window_rank_suite", "val"),  # c_acctbal passthrough (r5 fold)
    ("window_rank_suite", "d1"),   # lag/lead passthrough
    ("window_rank_suite", "d2"),
    # o_totalprice passthrough + (r5 fold) the former returnflag_stats
    # variance/corr/quantile moments — messy-repr/interpolated class,
    # evidenced green since r1 under their old entry name
    ("status_extrema", "val"),
    ("orders_scalar_suite", "capped"),  # passthrough or NULL
    ("orders_scalar_suite", "price_round"),  # 2dp->1dp: measured 0 diverge/1M
    ("array_suite", "v"),               # float32 elements + stats (messy reprs)
    ("geo_distance_radius", "lat"),     # same synthetic-coord formula both sides
    ("geo_distance_radius", "lon"),
    ("houses_slice_top25", "square"),   # strtod of the same raw string (exact)
    # sums of integer-valued doubles (exact)
    ("lineitem_orders_join", "sum_qty"),
    ("tpch_q1", "sum_qty"),
    ("grouping_suite", "val"),          # rollup sum(l_quantity)
    # messy-repr computed values (quotients/irrationals; repr never
    # terminates at the cut) — evidenced green since r1/r2
    ("tfidf_top_terms", "score"),  # tfidf + bm25 variants: ln-product sums
    # messy-repr cosine class (r5 fold: covers the former
    # similarity_bruteforce + ann_certify entries too)
    ("similarity_ann", "cos_sim"),
    ("pair_similarity", "value"),
    ("text_metrics", "punct_ratio"),
    ("text_metrics", "stop_ratio"),
    ("text_metrics", "quality"),
    ("geo_distance_radius", "dist_km"),
    ("pagerank_suppliers", "pr"),  # messy-repr quotient sums, round 6dp
    # integer-valued doubles (CMS counter estimates, exact distinct
    # count, 0/1 tolerance indicators) + the interpolated exact median
    # (same quantile_cont/percentile class evidenced green via
    # returnflag_stats p50/p90) — no re-rounded money aggregates
    ("approx_sketches", "value"),
}

SPECS = {n: s for n, s in all_queries().items() if s.oracle}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_unvetted_double_outputs(spark, name):
    df = SPECS[name].fn(spark, SF_ORACLE)
    doubles = {
        f.name for f in df.schema.fields if f.dataType.typeName() in ("double", "float")
    }
    unvetted = {c for c in doubles if (name, c) not in ALLOWED_DOUBLES}
    assert not unvetted, (
        f"{name} emits unvetted double column(s) {sorted(unvetted)} — convert "
        "to scaled BIGINT (see docs/ORACLE_NOTES.md) or allowlist with a "
        "safe-class justification"
    )


def test_oracle_pandas_dtypes_match_spark(spark, duck):
    """DuckDB `sum(BIGINT)` returns HUGEINT, which pandas renders as
    float64 — so a driver that canonicalizes both sides through pandas
    sees 225000000.0 vs Spark's 225000000 and flags a phantom mismatch
    on a value-identical column. Every integral Spark output column
    must come back integral from the oracle too (unless it is nullable
    AND actually contains NULLs, in which case BOTH sides coerce to
    float64 and agree). Fix pattern: CAST(sum(...) AS BIGINT)."""
    for name, spec in SPECS.items():
        sdf = spec.fn(spark, SF_ORACLE)
        stypes = {f.name: f.dataType.typeName() for f in sdf.schema.fields}
        ddf = duck.execute(spec.oracle).df()
        for col, dt in ddf.dtypes.items():
            if stypes.get(col) not in ("long", "integer", "short"):
                continue
            if str(dt).startswith(("int", "uint")):
                continue
            # float64 is only acceptable when NULLs force the coercion
            # (then Spark's toPandas coerces identically)
            assert ddf[col].isna().any(), (
                f"{name}.{col}: oracle dtype {dt} for a Spark "
                f"{stypes[col]} column with no NULLs — wrap the "
                "aggregate in CAST(... AS BIGINT)"
            )


def test_pandas_string_hash_driver_emulation(spark, duck):
    """Second comparator, emulating a pandas+stringify driver harness:
    toPandas both sides, sort columns/rows, hash str-rendered cells.
    Catches representation divergences the tuple compare can't —
    None-vs-NaN on nullable booleans, int64-vs-float64 from HUGEINT,
    '-0.0'-vs-'0.0' — each of which was a real r2/r3 finding."""
    import pandas as pd

    def canon(df: pd.DataFrame):
        df = df[sorted(df.columns)]
        df = df.sort_values(
            by=list(df.columns), kind="mergesort", na_position="last"
        ).reset_index(drop=True)
        return pd.util.hash_pandas_object(df.astype(str), index=False).sum()

    bad = []
    for name, spec in SPECS.items():
        if canon(spec.fn(spark, SF_ORACLE).toPandas()) != canon(
            duck.execute(spec.oracle).df()
        ):
            bad.append(name)
    assert not bad, f"string-level canonicalization mismatch: {bad}"
