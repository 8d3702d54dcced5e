"""Generate data/derived/houses_slice_raw.parquet — the reference
sample CSV re-parsed by an INDEPENDENT parser (Python csv module, not
Spark) and transcoded to a parquet the DuckDB oracle can read.

DuckDB cannot parse UTF-16 CSV, which kept ``houses_slice_top25``
rows-only since round 1. The engine under test still ingests the
actual UTF-16 file through its own dirty-CSV source; only the ORACLE
reads this artifact. Independence: Python's csv module implements RFC
4180 quoting (doublequote) on its own — a Spark CSV-parser bug cannot
leak into the artifact. Parity between the two parsers (modulo
''↔NULL, which the validity predicate treats identically) is asserted
by tests/test_derived_artifacts.py.

Row order in the artifact is the file order (kept in ``_row_idx`` for
audit), but nothing downstream depends on it: the pipeline renumbers
by the original ``house_id`` key, not by position.
"""

from __future__ import annotations

import csv
import os

import pyarrow as pa
import pyarrow.parquet as pq

SLICE = "/root/reference/data/russian_houses_slice.csv"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "derived",
    "houses_slice_raw.parquet",
)

COLUMNS = [
    "house_id",
    "latitude",
    "longitude",
    "maintenance_year",
    "square",
    "population",
    "region",
    "locality_name",
    "address",
    "full_address",
    "communal_service_id",
    "description",
]


def parse_rows(path: str = SLICE) -> list[list[str | None]]:
    """Parse with the stdlib csv module: header row skipped, every row
    padded/truncated to the 12 declared columns, '' → None (matching
    the Spark reader's default nullValue='' so both parsers present
    missing fields the same way)."""
    with open(path, encoding="utf-16", newline="") as fh:
        rd = csv.reader(fh)
        header = next(rd)
        assert [h.strip() for h in header] == COLUMNS, header
        rows = []
        for rec in rd:
            rec = (rec + [None] * 12)[:12]
            rows.append([(v if v != "" else None) for v in rec])
    return rows


def main() -> None:
    rows = parse_rows()
    arrays = {
        c: pa.array([r[i] for r in rows], type=pa.string())
        for i, c in enumerate(COLUMNS)
    }
    arrays["_row_idx"] = pa.array(range(len(rows)), type=pa.int64())
    table = pa.table(arrays)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
