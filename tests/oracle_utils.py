"""Local replica of the driver's Spark-vs-DuckDB compare.

Stricter than the driver is likely to be: sorts columns by name,
converts both sides to row-tuples of canonical python values, sorts
rows, and requires exact equality (dates/timestamps normalized to
isoformat strings, floats compared exactly — queries are expected to
round any float that could differ between engines).
"""

from __future__ import annotations

import datetime
import math


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return str(v)


def rows_to_canonical(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [columns[i] for i in order], out


def compare_spark_duckdb(spark_df, duck_con, sql):
    """Return (ok, message) comparing a Spark DataFrame and a DuckDB query."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_res = duck_con.execute(sql)
    d_cols = [d[0] for d in d_res.description]
    d_rows = d_res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    sc, s_canon = rows_to_canonical(s_cols, s_rows)
    dc, d_canon = rows_to_canonical(d_cols, d_rows)
    if len(s_canon) != len(d_canon):
        return False, f"row count: spark={len(s_canon)} duck={len(d_canon)}"
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        if a != b:
            return False, f"first diff at sorted row {i}: spark={a!r} duck={b!r}"
    return True, "ok"
