"""Single-node comparison baseline: run the bench headline queries'
EXACT oracle SQL in DuckDB on the same sf parquet, print per-query
seconds + total as one JSON line. Pairs with bench.py's Spark timings
for the SCALE.md measured comparison (same box, same data, same SQL
semantics).

Usage: python tools/bench_oracle_duckdb.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        n for n in HEADLINE if n in entrymod.oracle_sql()
    ]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
        except Exception as exc:
            timings[name] = -1.0
            print(f"DUCKDB ERROR {name}: {exc}", file=sys.stderr)
            continue
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"{name}: {dt}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "oracle_suite_seconds_duckdb",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
