"""exact_quantiles component attribution at sf1 (guide §1.4): where do
the ~3.3 s go — range exchange + checkpoint, counting pass, or the
phase-2 pass?

Usage: python tools/isolate_eq2.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:48s} {' '.join(f'{t:.3f}' for t in ts)}  "
          f"(min {min(ts):.3f}s)  load={os.getloadavg()[0]:.2f}",
          flush=True)
    return min(ts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="isolate_eq2")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    li = entry._t(spark, sf_dir, "lineitem")
    li.count()

    base = (li.select(F.col("l_extendedprice").alias("v"))
            .where(F.col("v").isNotNull()))

    sc.setJobDescription("eq2: scan only")
    timed("scan v -> noop",
          lambda: base.write.format("noop").mode("overwrite").save())

    sc.setJobDescription("eq2: range exchange + checkpoint")

    def ckpt():
        d = (base.repartitionByRange(F.col("v").asc())
             .withColumn("__pid__", F.spark_partition_id())
             .localCheckpoint(eager=True))
        return d

    t0 = time.perf_counter()
    d = ckpt()
    print(f"{'range exchange + eager checkpoint':48s} "
          f"{time.perf_counter() - t0:.3f}s", flush=True)

    sc.setJobDescription("eq2: counting pass over checkpoint")
    timed("groupBy(pid).count collect",
          lambda: (d.groupBy("__pid__").agg(F.count(F.lit(1)).alias("c"))
                   .orderBy("__pid__").collect()))

    sc.setJobDescription("eq2: arrow selection pass")
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        exact_quantiles,
    )
    timed("full NEW exact_quantiles collect",
          lambda: exact_quantiles(li, "l_extendedprice",
                                  qs=(0.25, 0.5, 0.75, 0.9, 0.99)).collect())

    # GK-band counterfactual: 2 aggregate-only passes, no exchange
    sc.setJobDescription("eq2: GK sketch pass")
    timed("agg n + percentile_approx(15 cuts)",
          lambda: base.agg(
              F.count(F.lit(1)),
              F.percentile_approx(
                  "v", [0.2498, 0.25, 0.2502, 0.4998, 0.5, 0.5002,
                        0.7498, 0.75, 0.7502, 0.8998, 0.9, 0.9002,
                        0.9898, 0.99, 0.9902], 10000)).collect())

    sc.setJobDescription("eq2: exact band-count pass")
    timed("agg 10 conditional counts",
          lambda: base.agg(
              *[F.sum(F.when(F.col("v") < F.lit(b), 1)
                      .otherwise(0)).alias(f"c{i}")
                for i, b in enumerate(
                    [30000.0, 36000.0, 45000.0, 53000.0, 60000.0,
                     30500.0, 36500.0, 45500.0, 53500.0, 60500.0])]
          ).collect())

    sc.setJobDescription("eq2: band filter collect")
    timed("band filter collect (~eps-n rows)",
          lambda: base.where(
              (F.col("v") >= 30000.0) & (F.col("v") <= 30060.0)
              | (F.col("v") >= 45000.0) & (F.col("v") <= 45060.0)
          ).collect())

    spark.stop()


if __name__ == "__main__":
    main()
