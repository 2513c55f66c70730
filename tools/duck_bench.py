"""DuckDB baseline timing: run each headline query's oracle SQL at the
given sf dir and print per-query seconds — the numbers bench.py is
graded against (BASELINE.md: within 2× of DuckDB on the same parquet).

Usage: python tools/duck_bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:] or [q for q in HEADLINE if q in entry.oracle_sql()]
    con = duckdb.connect()
    for t in entry.TABLES:
        src_pq = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src_pq):  # Spark-written table = a directory
            src_pq += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src_pq}'")
    oracles = entry.oracle_sql()
    timings = {}
    for name in only:
        t0 = time.perf_counter()
        n = len(con.execute(oracles[name]).fetchdf())  # columnar fetch, like bench.py's toPandas
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    print(json.dumps({"metric": "duckdb_oracle_wall_seconds",
                      "value": round(sum(timings.values()), 3),
                      "unit": "sec", "queries": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
