"""Round-11 session isolation harness #2 (guide §1.4 noop sink, §1.5
labels): interleaved old-vs-new exact_quantiles, component breakdown of
robust_value_anomalies, and warm walls for the sf1 tail entries.

Usage: python tools/isolate_r11b.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {' '.join(f'{t:.3f}' for t in ts)}  (min {min(ts):.3f}s)",
          flush=True)
    return min(ts)


def old_exact_quantiles(df, value_col, qs=(0.25, 0.5, 0.75, 0.9, 0.99)):
    """The pre-round-11 shape, verbatim: full sortWithinPartitions in
    phase 1, window over EVERY partition in phase 2."""
    vals = (df.select(F.col(value_col).alias("v"))
            .where(F.col("v").isNotNull())
            .repartitionByRange(F.col("v").asc())
            .sortWithinPartitions(F.col("v").asc())
            .withColumn("__pid__", F.spark_partition_id())
            .localCheckpoint(eager=True))
    part_counts = (vals.groupBy("__pid__")
                   .agg(F.count(F.lit(1)).alias("c"))
                   .orderBy("__pid__").collect())
    offsets, acc = {}, 0
    for r in part_counts:
        offsets[r["__pid__"]] = acc
        acc += r["c"]
    n = acc
    targets = {}
    for q in sorted(set(qs)):
        targets.setdefault(int(-(-q * n // 1)), []).append(float(q))
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("__pid__").orderBy(F.col("v").asc())
    rank = (off_map[F.col("__pid__")] + F.row_number().over(w)).cast("long")
    tgt = F.create_map(
        *[x for k, qlist in targets.items()
          for x in (F.lit(k), F.array(*[F.lit(v) for v in qlist]))])
    return (vals.withColumn("rank", rank)
            .where(F.col("rank").isin(*targets.keys()))
            .select(F.explode(tgt[F.col("rank")]).alias("q"), "rank",
                    F.col("v").cast("double").alias("value"))
            .orderBy("q"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="isolate_r11b")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    li = entry._t(spark, sf_dir, "lineitem")
    ev = entry._t(spark, sf_dir, "events")
    li.count(); ev.count()
    qs = entry.queries()

    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        exact_quantiles,
    )

    print("== exact_quantiles, interleaved old vs new (collect — the "
          "operator ends in a driver-sized result) ==")
    for _ in range(3):
        sc.setJobDescription("exact_quantiles OLD")
        timed("old exact_quantiles(lineitem)", lambda: old_exact_quantiles(
            li, "l_extendedprice", qs=(0.25, 0.5, 0.75, 0.9, 0.99)).collect(), n=1)
        sc.setJobDescription("exact_quantiles NEW")
        timed("new exact_quantiles(lineitem)", lambda: exact_quantiles(
            li, "l_extendedprice", qs=(0.25, 0.5, 0.75, 0.9, 0.99)).collect(), n=1)

    print("== robust_value_anomalies components ==")
    from etl_excel_to_hyper_tableau_spark.streaming.events import (
        robust_value_anomalies,
    )
    sc.setJobDescription("robust full entry")
    timed("full entry robust_anomalies (toPandas)",
          lambda: qs["robust_anomalies"](spark, sf_dir).toPandas())
    sc.setJobDescription("robust operator noop")
    timed("operator -> noop",
          lambda: noop(robust_value_anomalies(ev, "event_type", "value",
                                              "event_id", z=3.5)))

    vals = (ev.select(F.col("event_type").alias("key"),
                      F.col("event_id").alias("id"),
                      F.col("value").cast("double").alias("v"))
            .where(F.col("v").isNotNull()))
    sc.setJobDescription("robust vals scan")
    timed("vals scan -> noop", lambda: noop(vals))

    def per_key_median(d, col):
        w = Window.partitionBy("key").orderBy(F.col(col).asc(),
                                              F.col("id").asc())
        wc = Window.partitionBy("key")
        return (d.withColumn("__rn__", F.row_number().over(w))
                .withColumn("__n__", F.count(F.lit(1)).over(wc))
                .where(F.col("__rn__")
                       == F.ceil(F.col("__n__") / F.lit(2.0)).cast("int"))
                .select("key", F.col(col).alias(f"med_{col}")))

    sc.setJobDescription("robust med pass")
    timed("med window pass -> noop", lambda: noop(per_key_median(vals, "v")))
    med = per_key_median(vals, "v").withColumnRenamed("med_v", "med")
    dev = (vals.join(F.broadcast(med), "key")
           .withColumn("d", F.abs(F.col("v") - F.col("med"))))
    sc.setJobDescription("robust dev pass")
    timed("dev join pass -> noop", lambda: noop(dev))
    sc.setJobDescription("robust mad pass")
    timed("mad window pass -> noop", lambda: noop(
        per_key_median(dev.select("key", "id", F.col("d").alias("v")), "v")))

    print("== sf1 tail entries, warm walls (2 runs each, toPandas as "
          "benched) ==")
    for name in ("token_fertility", "segment_dedup", "mmr_select",
                 "cdc_latest_events", "context_pairs"):
        sc.setJobDescription(name)
        fn = qs[name]
        fn(spark, sf_dir).toPandas()
        timed(f"{name} warm", lambda: fn(spark, sf_dir).toPandas(), n=2)

    spark.stop()


if __name__ == "__main__":
    main()
