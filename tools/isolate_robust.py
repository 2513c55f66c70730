"""Round-11 isolation (guide §1.4/§1.5): interleaved old-vs-new
robust_value_anomalies at sf1 — the old shape is the pre-round-11
broadcast-join form copied verbatim from git HEAD; the new shape is the
single-exchange windowed-max rewrite in streaming/events.py.

Usage: python tools/isolate_robust.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from etl_excel_to_hyper_tableau_spark.streaming.events import (  # noqa: E402
    robust_value_anomalies,
)
from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_robust_value_anomalies(df, key_col, value_col, id_col,
                               z=3.5) -> DataFrame:
    """Pre-round-11 shape, verbatim: per-key medians extracted as
    key-sized tables and broadcast-joined back (subtree re-execution)."""
    vals = df.select(F.col(key_col).alias("key"),
                     F.col(id_col).alias("id"),
                     F.col(value_col).cast("double").alias("v")) \
        .where(F.col("v").isNotNull())

    def per_key_median(d: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("key").orderBy(F.col(col).asc(),
                                              F.col("id").asc())
        wc = Window.partitionBy("key")
        return (d.withColumn("__rn__", F.row_number().over(w))
                .withColumn("__n__", F.count(F.lit(1)).over(wc))
                .where(F.col("__rn__")
                       == F.ceil(F.col("__n__") / F.lit(2.0)).cast("int"))
                .select("key", F.col(col).alias(f"med_{col}")))

    med = per_key_median(vals, "v").withColumnRenamed("med_v", "med")
    dev = (vals.join(F.broadcast(med), "key")
           .withColumn("d", F.abs(F.col("v") - F.col("med"))))
    mad = per_key_median(dev.select("key", "id", F.col("d").alias("v")),
                         "v").withColumnRenamed("med_v", "mad")
    scored = (dev.join(F.broadcast(mad), "key")
              .where(F.col("mad") > 0)
              .withColumn("rscore",
                          F.lit(0.6745) * (F.col("v") - F.col("med"))
                          / F.col("mad")))
    return (scored.where(F.abs(F.col("rscore")) > z)
            .select("key", "id", F.col("v").alias("value"), "med", "mad",
                    "rscore"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="isolate_robust")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    ev = entry._t(spark, sf_dir, "events")
    ev.count()

    def run(fn, label):
        sc.setJobDescription(label)
        t0 = time.perf_counter()
        n = fn(ev, "event_type", "value", "event_id", z=3.5).toPandas()
        dt = time.perf_counter() - t0
        print(f"{label:14s} {dt:6.3f}s  rows={len(n)}  "
              f"load={os.getloadavg()[0]:.2f}", flush=True)
        return dt

    for _ in range(rounds):
        run(old_robust_value_anomalies, "robust OLD")
        run(robust_value_anomalies, "robust NEW")
    spark.stop()


if __name__ == "__main__":
    main()
