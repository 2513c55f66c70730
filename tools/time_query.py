"""Time individual queries() entries at a given sf (warm run, same
methodology as bench.py: two executions, second reported) — the
iteration loop for driving a single entry under the 2× gate.

Usage: python tools/time_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    spark = get_spark(app_name="time_query")
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in entry.TABLES:
        try:
            entry._t(spark, sf_dir, t).count()
        except Exception:
            pass
    qs = entry.queries()
    for name in args:
        fn = qs[name]
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).toPandas())
            times.append(time.perf_counter() - t0)
        print(f"{name}: cold {times[0]:.3f}s warm {times[1]:.3f}s "
              f"({n} rows)")


if __name__ == "__main__":
    main()
