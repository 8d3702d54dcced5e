"""Distribution drift detection between two table snapshots.

A standing ingest pipeline needs to notice when upstream data shifts —
a crawler change flips the language mix, a schema migration zeroes a
column, a partner feed starts sending cents instead of dollars. The
standard monitoring statistic is PSI (population stability index):

    PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

over a binned view of each column, reference (p) vs current (q).
Common operating points: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
action required.

Scale shape:

- Numeric columns: bin edges come from the REFERENCE snapshot's
  approx quantiles (one aggregate over all columns together), so bins
  are equal-population by construction — the degenerate all-in-one-bin
  failure of fixed-width bins on skewed data can't happen. Both
  snapshots are then binned with the same edges in ONE wide
  conditional aggregate per table — two scans total for any number of
  numeric columns, never a pass per column.
- Categorical columns: the reference's top-k values (bounded groupBy)
  become the category set, everything else folds into ``__other__``;
  counts again ride the same one-aggregate-per-table pass via
  conditional sums.
- The PSI arithmetic runs driver-side on the tiny (cols × bins) count
  matrix — bounded by the report size, not the data.

NULLs are a bin of their own for both kinds: a column going
suddenly-null is precisely the drift a monitor must catch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["numeric_edges", "drift_report"]

_EPS = 1e-6  # PSI smoothing: empty bins contribute ln(eps)-bounded terms


def numeric_edges(
    ref: DataFrame, cols: list[str], bins: int = 10
) -> dict[str, list[float]]:
    """Equal-population bin edges per column from the reference
    snapshot (interior quantiles; outermost edges are ±inf so current
    data beyond the reference's range still lands in a bin)."""
    qs = [i / bins for i in range(1, bins)]
    row = ref.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(c)
            for c in cols
        ]
    ).first()
    out: dict[str, list[float]] = {}
    for c in cols:
        # dedupe: a heavily-repeated value collapses adjacent quantiles;
        # equal edges would make empty always-zero bins on both sides
        # (harmless for PSI but noisy), so keep strictly increasing ones
        edges, seen = [], set()
        for e in row[c] or []:
            if e is not None and e not in seen:
                seen.add(e)
                edges.append(float(e))
        out[c] = edges
    return out


def _top_categories(ref: DataFrame, cols: list[str], top_k: int) -> dict[str, list]:
    """Reference's top-k values per categorical column. One bounded
    groupBy per column — discovery needs a distinct grouping key, so
    these C small scans are the one per-column cost; the COUNTING for
    both snapshots rides the single shared aggregate below."""
    return {
        c: [
            r[c]
            for r in ref.filter(F.col(c).isNotNull())
            .groupBy(c)
            .count()
            .orderBy(F.desc("count"), F.asc(c))
            .limit(top_k)
            .collect()
        ]
        for c in cols
    }


def _bucket_conds(
    edges: dict[str, list[float]], cats: dict[str, list]
) -> dict[str, list]:
    """Per column, the ordered list of bucket predicates (value buckets
    + ``__other__`` for categoricals + NULL bucket last)."""
    conds: dict[str, list] = {}
    for c, es in edges.items():
        col = F.col(c).cast("double")
        cs, lo = [], None
        for e in es:
            cs.append(col <= e if lo is None else (col > lo) & (col <= e))
            lo = e
        cs.append(col > lo if lo is not None else col.isNotNull())
        cs.append(col.isNull())
        conds[c] = cs
    for c, values in cats.items():
        cs = [F.col(c) == F.lit(v) for v in values]
        cs.append(
            F.col(c).isNotNull() & ~F.col(c).isin(values)
            if values
            else F.col(c).isNotNull()
        )
        cs.append(F.col(c).isNull())
        conds[c] = cs
    return conds


def _bucket_counts(
    df: DataFrame, conds: dict[str, list]
) -> dict[str, list[int]]:
    """ONE wide aggregate for every column of both kinds."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"{c}__{i}")
        for c, cs in conds.items()
        for i, cond in enumerate(cs)
    ]
    row = df.agg(*aggs).first()
    return {
        c: [row[f"{c}__{i}"] or 0 for i in range(len(cs))]
        for c, cs in conds.items()
    }


def _psi(p_counts: list[int], q_counts: list[int]) -> float:
    p_tot, q_tot = max(sum(p_counts), 1), max(sum(q_counts), 1)
    psi = 0.0
    for pc, qc in zip(p_counts, q_counts):
        p = max(pc / p_tot, _EPS)
        q = max(qc / q_tot, _EPS)
        psi += (p - q) * math.log(p / q)
    return psi


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    bins: int = 10,
    top_k: int = 20,
) -> dict[str, dict]:
    """PSI per column, reference vs current. Column lists default to a
    dtype split of the shared schema (numeric vs string). Returns
    ``{col: {"psi": float, "kind": ..., "ref_rows": n, "cur_rows": n}}``
    — thresholding is the caller's policy (0.1/0.25 are the customary
    alert lines)."""
    shared = [f for f in ref.schema.fields if f.name in set(cur.columns)]
    if numeric_cols is None:
        numeric_cols = [
            f.name
            for f in shared
            if f.dataType.typeName()
            in ("integer", "long", "double", "float", "short", "decimal")
        ]
    if categorical_cols is None:
        categorical_cols = [
            f.name for f in shared if f.dataType.typeName() == "string"
        ]
    edges = numeric_edges(ref, numeric_cols, bins) if numeric_cols else {}
    cats = _top_categories(ref, categorical_cols, top_k)
    conds = _bucket_conds(edges, cats)
    if not conds:
        return {}
    pc = _bucket_counts(ref, conds)
    qc = _bucket_counts(cur, conds)
    return {
        c: {
            "psi": _psi(pc[c], qc[c]),
            "kind": "numeric" if c in edges else "categorical",
            "ref_rows": sum(pc[c]),
            "cur_rows": sum(qc[c]),
        }
        for c in conds
    }
