"""The engine's physical-layout levers on one page — the four staging
decisions a 100 TB deployment makes once and every query amortizes,
each with its plan property printed as proof:

    bucketing        → equi-joins with ZERO shuffle exchanges, and
                       point lookups reading 1/n_buckets of the table
    partitionBy      → dynamic partition pruning: a selective dim
                       filter skips fact partitions at runtime
    z-order          → multi-column range clustering: compact per-file
                       bounding boxes in EVERY interleaved dimension
    salting          → one hot key spread over salt_factor partitions

Every lever is an oracle-verified `queries()` entry; this script just
composes them and prints the plan evidence.  Run:

    python examples/layout_levers_example.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from etl_excel_to_hyper_tableau_spark.operators.skew import (  # noqa: E402
    salted_join,
)
from etl_excel_to_hyper_tableau_spark.plans.bucketing import (  # noqa: E402
    co_located_join, join_exchanges, selected_buckets, write_bucketed,
)
from etl_excel_to_hyper_tableau_spark.plans.pruning import (  # noqa: E402
    dpp_filter_count, stage_partitioned,
)
from etl_excel_to_hyper_tableau_spark.plans.zorder import (  # noqa: E402
    pushed_filter_count, stage_zordered,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="lay_")
    spark = get_spark(master="local[8]")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # 1. Bucketing: the join shuffle paid once, at write time ---------
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "ex_lineitem_b", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                                 "o_orderpriority"),
                   "ex_orders_b", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    j = co_located_join(spark, "ex_lineitem_b", "ex_orders_b",
                        ["l_orderkey"], force_sort_merge=True)
    print(f"bucketed join      : shuffle exchanges = {join_exchanges(j)} "
          f"(rows={j.count()})")

    # ... and bucket-pruned point lookups on the same staging
    lookup = (spark.table("ex_orders_b")
              .filter(F.col("l_orderkey") == 7)
              .groupBy("l_orderkey", "o_orderpriority").count())
    print(f"point lookup       : SelectedBucketsCount = "
          f"{selected_buckets(lookup)}")

    # 2. Partitioned staging + dynamic partition pruning --------------
    stage_partitioned(
        orders.withColumn("o_month",
                          F.date_format("o_orderdate", "yyyy-MM")),
        f"{work}/orders_bymonth", ["o_month"])
    fact = spark.read.parquet(f"{work}/orders_bymonth")
    dim = (li.filter(F.col("l_returnflag") == "R")
           .select(F.date_format("l_shipdate", "yyyy-MM").alias("o_month"))
           .distinct().limit(3))
    dj = fact.join(dim, "o_month")
    print(f"partitioned staging: dynamic pruning filters = "
          f"{dpp_filter_count(dj)}")

    # 3. Z-order: multi-column clustering for range scans -------------
    stage_zordered(li, f"{work}/lineitem_z",
                   ["l_shipdate", "l_partkey"], n_files=16)
    z = (spark.read.parquet(f"{work}/lineitem_z")
         .filter((F.col("l_shipdate") >= "1996-03-01")
                 & (F.col("l_shipdate") < "1996-06-01")
                 & (F.col("l_partkey") >= 100)
                 & (F.col("l_partkey") <= 400)))
    print(f"z-ordered staging  : pushed filters = {pushed_filter_count(z)} "
          f"(rows={z.count()}; per-file 2-D bounding boxes audited in "
          f"tests/test_zorder.py)")

    # 4. Salting: one hot key spread over 8 shuffle partitions --------
    s = salted_join(li.select("l_orderkey", "l_quantity"),
                    orders.select(F.col("o_orderkey").alias("l_orderkey"),
                                  "o_orderstatus"),
                    "l_orderkey", salt_factor=8)
    print(f"salted join        : rows = {s.count()} "
          f"(equal to the plain join — salt is pure load balancing)")

    for t in ("ex_lineitem_b", "ex_orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
