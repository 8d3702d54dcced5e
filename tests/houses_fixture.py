"""Deterministic dirty houses CSV fixture (FIXTURES.md §B).

Reproduces the reference input's defect classes — space/NBSP thousands
separators, em-dash placeholders, empty years/coords/population/
region, float-formatted communal_service_id, quoted fields containing
commas and newlines — with exact knowledge of which rows are valid, so
e2e tests can assert the validation split to the row.
"""

from __future__ import annotations

import codecs
import random
from dataclasses import dataclass

HEADER = (
    "house_id,latitude,longitude,maintenance_year,square,population,"
    "region,locality_name,address,full_address,communal_service_id,description"
)

REGIONS = [f"Region_{i}" for i in range(12)]
LOCALITIES = [f"City_{i}" for i in range(40)]


@dataclass
class HousesFixture:
    path: str
    n_rows: int
    n_valid: int
    valid_rows: list[dict]  # parsed canonical values for every valid row


def _fmt_square(value: float, rng: random.Random) -> str:
    s = f"{value:,.2f}"
    sep = " " if rng.random() < 0.02 else " "
    return s.replace(",", sep)


def generate(path: str, n_rows: int = 2000, seed: int = 42) -> HousesFixture:
    lines, valid_rows = _generate_records(n_rows, seed)
    payload = "\r\n".join([HEADER, *lines]) + "\r\n"
    with codecs.open(path, "w", encoding="utf-16") as f:
        f.write(payload)
    return HousesFixture(
        path=path, n_rows=n_rows, n_valid=len(valid_rows), valid_rows=valid_rows
    )


def generate_sharded(
    dir_path: str, n_rows: int = 2000, seed: int = 42, n_files: int = 8
) -> HousesFixture:
    """The SAME rows as :func:`generate` (same seed → byte-identical
    records) laid out as ``n_files`` CSV files in a directory, each
    with its own header — the realistic at-scale feed layout. multiLine
    CSV is unsplittable (one parse task per FILE), so this layout is
    what gives the ingest stage file-count parallelism; the single-file
    layout is the measured cliff (VERDICT r7 #1). Records are split
    contiguously (not round-robin) so each file is a clean slice of
    the feed, like a date-partitioned export."""
    import os

    lines, valid_rows = _generate_records(n_rows, seed)
    os.makedirs(dir_path, exist_ok=True)
    per = -(-len(lines) // n_files)
    for k in range(n_files):
        chunk = lines[k * per : (k + 1) * per]
        payload = "\r\n".join([HEADER, *chunk]) + "\r\n"
        with codecs.open(
            os.path.join(dir_path, f"houses-{k:03d}.csv"), "w", encoding="utf-16"
        ) as f:
            f.write(payload)
    return HousesFixture(
        path=dir_path, n_rows=n_rows, n_valid=len(valid_rows), valid_rows=valid_rows
    )


def _generate_records(n_rows: int, seed: int) -> tuple[list[str], list[dict]]:
    rng = random.Random(seed)
    lines: list[str] = []
    valid_rows: list[dict] = []

    for i in range(n_rows):
        house_id = str(1_000_000 + i * 7)
        lat = round(rng.uniform(41.0, 82.0), 6)
        lon = round(rng.uniform(19.0, 180.0), 6)
        year = rng.randint(1798, 2014)
        square = round(rng.uniform(20.0, 5000.0), 2)
        population = rng.randint(0, 5000)
        region = rng.choice(REGIONS)
        locality = rng.choice(LOCALITIES)
        address = f"st. Builders, {rng.randint(1, 200)}"
        full_address = f"{region}, {locality}, {address}"
        csid = rng.randint(1, 99)
        desc = f"house {i}"

        lat_s, lon_s = str(lat), str(lon)
        year_s = str(year)
        square_s = _fmt_square(square, rng)
        pop_s = str(population)
        csid_s = f"{csid}.0"  # float-formatted, like the real feed (quirk Q1)
        region_s, locality_s = region, locality

        defect = None
        r = rng.random()
        if r < 0.12:
            defect = rng.choice(
                ["year_empty", "year_junk", "square_dash", "square_multidot",
                 "coords_empty", "pop_empty", "region_empty", "locality_empty"]
            )
        if defect == "year_empty":
            year_s = ""
        elif defect == "year_junk":
            year_s = rng.choice(["18xx", "—", "1 903 г", "none"])
        elif defect == "square_dash":
            square_s = "—"
        elif defect == "square_multidot":
            # quirk Q5: "1.2.3" survives the digit-strip but must fail the
            # format/cast probes WITHOUT throwing (ANSI-cast regression)
            square_s = "1.2.3"
        elif defect == "coords_empty":
            lat_s = lon_s = ""
        elif defect == "pop_empty":
            pop_s = ""
        elif defect == "region_empty":
            region_s = ""
        elif defect == "locality_empty":
            locality_s = ""

        if defect == "year_junk" and year_s == "1 903 г":
            # digit-strip yields "1903": a VALID 4-digit year (quirk class)
            defect = None
            year = 1903

        multiline = rng.random() < 0.03
        if multiline:
            desc = f"big house\nsecond line {i}"

        def q(s: str) -> str:
            return '"' + s.replace('"', '""') + '"'

        lines.append(
            ",".join(
                [
                    house_id,
                    lat_s,
                    lon_s,
                    q(year_s) if year_s else year_s,
                    q(square_s),
                    pop_s,
                    q(region_s),
                    q(locality_s),
                    q(address),
                    q(full_address),
                    csid_s,
                    q(desc),
                ]
            )
        )

        if defect is None:
            valid_rows.append(
                {
                    "orig_house_id": int(house_id),
                    "latitude": lat,
                    "longitude": lon,
                    "year": year,
                    "square": square,
                    "population": population,
                    "region": region,
                    "locality_name": locality,
                    # quirk Q1: digit-strip of "NN.0" -> NN0
                    "communal_service_id": int(f"{csid}0"),
                }
            )

    return lines, valid_rows
