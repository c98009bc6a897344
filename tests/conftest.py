from __future__ import annotations

import gzip
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cocktailsdb_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    return get_spark("cocktailsdb-tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# --- Family B reference-shaped fixtures (FIXTURES.md) ----------------------

GLASSES = [
    "highball glass",
    "martini glass",
    "old-fashioned glass",
    "coupe",
    "shot glass",
]
DRINKS = ["Sweet Sangria", "Mojito", "Kool-Aid Slammer", "Paradise", "Negroni", "Daiquiri"]
BARS = ["budapest", "london", "new york"]


def _sales_rows(n: int, start_min: int = 0) -> list[tuple[int, str, str, str]]:
    """Deterministic ISO-timestamp sales rows (2020-12-26 base day)."""
    rows = []
    for i in range(n):
        minute = start_min + i * 7
        ts = f"2020-12-26 {10 + minute // 60:02d}:{minute % 60:02d}:00"
        rows.append((i, ts, DRINKS[i % len(DRINKS)], f"{2.99 + (i % 5)}"))
    return rows


@pytest.fixture(scope="session")
def bar_fixtures(tmp_path_factory) -> dict[str, str]:
    """Write the four reference-shaped input files (B1-B4):
    B1 gzip CSV w/ Hungarian header, B2 headerless gzip TSV,
    B3 gzip CSV w/ US 'MM-dd-yyyy HH:mm' dates, B4 dirty-stock CSV."""
    d = tmp_path_factory.mktemp("bar_data")

    budapest = d / "budapest.csv.gz"
    with gzip.open(budapest, "wt") as f:
        f.write(",TS,ital,költség\n")  # discarded foreign-language header
        for idx, ts, drink, price in _sales_rows(20):
            f.write(f"{idx},{ts},{drink},{price}\n")

    london = d / "london_transactions.csv.gz"
    with gzip.open(london, "wt") as f:  # NO header, tab sep
        for idx, ts, drink, price in _sales_rows(15, start_min=3):
            f.write(f"{idx}\t{ts}\t{drink}\t{price}\n")

    ny = d / "ny.csv.gz"
    with gzip.open(ny, "wt") as f:
        f.write(",time,drink,amount\n")
        # pinned row from FIXTURES.md B3
        f.write("0,12-26-2020 22:47,Paradise,4.2\n")
        for idx, ts, drink, price in _sales_rows(10, start_min=6):
            us = ts[5:7] + "-" + ts[8:10] + "-" + ts[0:4] + " " + ts[11:16]
            f.write(f"{idx + 1},{us},{drink},{price}\n")

    bar_csv = d / "bar_data.csv"
    lines = ["glass_type,stock,bar"]
    for bar in BARS:
        for gi, glass in enumerate(GLASSES):
            stock = "34 glasses" if (bar == "new york" and glass == "highball glass") else str(5 + gi * 10)
            lines.append(f"{glass},{stock},{bar}")
    bar_csv.write_text("\n".join(lines) + "\n")

    return {
        "budapest": str(budapest),
        "london": str(london),
        "ny": str(ny),
        "bar_data": str(bar_csv),
        "dir": str(d),
    }
