"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry through Spark AND its ``oracle_sql()`` through
DuckDB on the same parquet, compare row count, column names and an
order-insensitive value hash.

Usage: python tools/parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402


def value_hash(df: pd.DataFrame) -> int:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(repr(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hash(tuple(rows))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # literal-bearing oracles (embedding_whiten) build their literals
    # for the sf the oracle will RUN on
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in entry.TABLES:
        src_pq = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src_pq):  # Spark-written table = a directory
            src_pq += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src_pq}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} (no oracle — rows-only check)")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {str(e)[:300]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            a = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
            b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
            diff_shown = 0
            for i in range(min(len(a), len(b))):
                ra, rb = list(a.iloc[i]), list(b.iloc[i])
                if [repr(x) for x in ra] != [repr(x) for x in rb]:
                    print(f"      row {i}: spark={ra}")
                    print(f"      row {i}: duck ={rb}")
                    diff_shown += 1
                    if diff_shown >= 3:
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
