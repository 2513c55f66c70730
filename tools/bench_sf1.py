"""Build a full ≈sf1 corpus (10× sf0.1) and run the WHOLE bench
headline set against it — VERDICT r4 #5: convert the per-operator 10×
spot ratios in SCALING.md into one full-set measurement, so "survives
100×" rests on data, not extrapolation.

Corpus: tools/scale_check.py's duplicate-density-preserving 10×
transforms (documents Caesar-per-copy, embeddings dim-rotation-per-
copy, lineitem/part/events offset keys) EXTENDED with scaled orders
and customer (offset keys consistent with lineitem.l_orderkey and
events.user_id) so every TPC-H join scales on both sides; nation/
region/supplier stay 1× (they are dims at every scale).

Usage:
    python tools/bench_sf1.py            # builds /tmp/sf1 then runs
                                         # bench.py against it
Writes the bench JSON line to stdout (redirect to BENCH_sf1.json).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scale_check  # noqa: E402

DST = "/tmp/sf1"
SRC = scale_check.SRC
COPIES = scale_check.COPIES


def build() -> None:
    scaled = dict(scale_check.SCALED_SQL)
    scaled["orders"] = f"""
        SELECT o_orderkey + k * 100000000 AS o_orderkey,
               o_custkey + k * 1000000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'),
             (SELECT unnest(range({COPIES})) AS k)"""
    scaled["customer"] = f"""
        SELECT c_custkey + k * 1000000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet'),
             (SELECT unnest(range({COPIES})) AS k)"""
    old_dst, old_sql = scale_check.DST, scale_check.SCALED_SQL
    scale_check.DST, scale_check.SCALED_SQL = DST, scaled
    try:
        # ~16 MB files → the 113 MB lineitem becomes ~7 input splits
        # instead of ONE (the single-file corpus serialized every
        # scan-bound query onto one task — measured 20-126× at 10×
        # data; multi-file is also the only honest 100 TB layout)
        scale_check.build_scaled(file_size_bytes=16 << 20)
    finally:
        scale_check.DST, scale_check.SCALED_SQL = old_dst, old_sql


def main() -> int:
    build()
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=DST)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.call([sys.executable, os.path.join(repo, "bench.py")],
                           env=env)


if __name__ == "__main__":
    raise SystemExit(main())
