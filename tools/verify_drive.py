"""One-command verify drive: (1) E2E library run over a generated xlsx
workbook, (2) every ``queries()`` entry executed at the given sf with
row-count comparison against its DuckDB oracle (use tools/parity.py for
the stricter value-hash comparison — this drive optimizes for speed as
a pre-commit gate).

Usage: python tools/verify_drive.py [sf_dir]   (default sf0.001)
Exit code 0 = everything ran and matched.
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import (  # noqa: E402
    QueryBundle, QueryEngine, get_spark,
)
from etl_excel_to_hyper_tableau_spark.sources import xlsx_io  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # literal-bearing oracles (embedding_whiten) build their literals
    # for the sf the oracle will RUN on
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf
    spark = get_spark(master="local[8]")

    # 1. library E2E: workbook in → engine → workbook out
    d = tempfile.mkdtemp(prefix="verify_")
    xlsx_io.write_workbook(f"{d}/data.xlsx",
                           [("Sheet1", ["a", "b"], [[1, "x"], [2, "y"]])])
    b = QueryBundle.from_strings(
        "o", "excel", ["data"], ["Sheet1"],
        ["SELECT a, COUNT(a) AS n FROM Sheet1.sheet GROUP BY a"], ["q"])
    out = QueryEngine(spark, d, [b], d).process_queries()
    assert out, "library E2E produced no output"
    print(f"E2E drive ok: {out}")

    # 2. driver contract: every query runs; oracle row counts match
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        try:
            n_spark = len(fn(spark, sf).toPandas())
            if name in oracles:
                n_oracle = len(con.execute(oracles[name]).fetchdf())
                if n_spark != n_oracle:
                    bad.append((name, n_spark, n_oracle))
        except Exception as ex:  # noqa: BLE001 — report, don't die
            bad.append((name, str(ex)[:160]))
    print(f"checked: {len(qs)} bad: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
