"""Round-11 session isolation harness #3 (guide §1.4 noop sink, §1.5
labels): quiet-window re-measure of exact_quantiles old-vs-new, the
rewritten robust_anomalies, and component breakdowns for the remaining
sf1 >2x tail (segment_dedup, mmr_select, context_pairs,
cdc_latest_events).

Usage: python tools/isolate_r11c.py [sf_dir] [section ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sections = set(sys.argv[2:]) or {"eq", "robust", "segment", "mmr",
                                     "context", "cdc"}
    spark = get_spark(app_name="isolate_r11c")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry.queries()

    if "eq" in sections:
        from tools.isolate_r11b import old_exact_quantiles
        from etl_excel_to_hyper_tableau_spark.operators.sketches import (
            exact_quantiles,
        )
        li = entry._t(spark, sf_dir, "lineitem")
        li.count()
        print("== exact_quantiles, interleaved old vs new ==", flush=True)
        for _ in range(4):
            sc.setJobDescription("exact_quantiles OLD")
            timed("old exact_quantiles(lineitem)",
                  lambda: old_exact_quantiles(
                      li, "l_extendedprice",
                      qs=(0.25, 0.5, 0.75, 0.9, 0.99)).collect(), n=1)
            sc.setJobDescription("exact_quantiles NEW")
            timed("new exact_quantiles(lineitem)",
                  lambda: exact_quantiles(
                      li, "l_extendedprice",
                      qs=(0.25, 0.5, 0.75, 0.9, 0.99)).collect(), n=1)

    if "robust" in sections:
        print("== robust_anomalies (rewritten single-exchange) ==",
              flush=True)
        sc.setJobDescription("robust full entry NEW")
        timed("robust_anomalies entry (toPandas)",
              lambda: qs["robust_anomalies"](spark, sf_dir).toPandas())

    if "segment" in sections:
        print("== segment_dedup components ==", flush=True)
        from etl_excel_to_hyper_tableau_spark.operators import dedup as dd
        from etl_excel_to_hyper_tableau_spark.operators.parallelism import (
            spread,
        )
        from etl_excel_to_hyper_tableau_spark.operators.text import tokens
        docs = entry._t(spark, sf_dir, "documents")
        docs.count()
        sc.setJobDescription("segment_dedup full entry")
        timed("segment_dedup entry (toPandas)",
              lambda: qs["segment_dedup"](spark, sf_dir).toPandas())
        toks = tokens(F.col("text"))
        seg_tokens = 10

        def _segments(ts):
            return F.transform(
                F.sequence(F.lit(0),
                           F.greatest((F.size(ts) - 1) / F.lit(seg_tokens),
                                      F.lit(0)).cast("int"),
                           F.lit(1)),
                lambda b: F.concat_ws(
                    " ", F.slice(ts, b * seg_tokens + 1, seg_tokens)))

        seg_arr = F.element_at(F.transform(F.array(toks), _segments), 1)
        segs = (spread(docs).select(
                    F.col("doc_id"),
                    F.posexplode(seg_arr).alias("seg_idx", "seg"))
                .where(F.col("seg") != "")
                .withColumn("__dig__", F.md5(F.col("seg"))))
        sc.setJobDescription("segment: explode pass")
        timed("segs explode+digest -> noop", lambda: noop(segs))
        kept = (segs.groupBy("__dig__")
                .agg(F.min(F.struct(F.col("doc_id").alias("id"),
                                    F.col("seg_idx").alias("seg_idx"),
                                    F.col("seg").alias("seg"))).alias("w")))
        sc.setJobDescription("segment: election")
        timed("election -> noop", lambda: noop(kept))
        totals = docs.select(
            F.col("doc_id"),
            F.greatest(F.ceil(F.size(toks) / F.lit(seg_tokens)),
                       F.lit(1)).cast("long").alias("n_segments"))
        sc.setJobDescription("segment: totals scan")
        timed("totals (re-tokenize) -> noop", lambda: noop(totals))

    if "mmr" in sections:
        print("== mmr_select path attribution ==", flush=True)
        from etl_excel_to_hyper_tableau_spark.operators import (
            similarity as sim,
        )
        emb = entry._t(spark, sf_dir, "embeddings")
        emb.count()
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        corpus = emb.filter(F.col("vec_id") >= 3)
        sc.setJobDescription("mmr full entry (default valve)")
        timed("mmr_topk default valve (collect)",
              lambda: sim.mmr_topk(corpus, "embedding", "vec_id",
                                   [float(x) for x in qv], k=5,
                                   lam=0.7).collect())
        # survivor-set size at sf1: how many rows pass the prune?
        from etl_excel_to_hyper_tableau_spark.operators.dedup import (
            _dot, _norm,
        )
        q = F.array(*[F.lit(float(x)) for x in qv])
        scored = corpus.select(
            F.col("vec_id").cast("long").alias("id"),
            (_dot(F.col("embedding").cast("array<double>"), q)
             / (_norm(F.col("embedding").cast("array<double>"))
                * _norm(q))).alias("rel"))
        top = scored.orderBy(F.desc("rel"), F.asc("id")).limit(5).collect()
        thr = top[-1]["rel"] - 2.0 * 0.3 / 0.7
        n_surv = scored.where(F.col("rel") >= thr).count()
        n_all = scored.count()
        print(f"survivors at thr={thr:.4f}: {n_surv} of {n_all}",
              flush=True)
        sc.setJobDescription("mmr rel scan")
        timed("rel scan -> noop", lambda: noop(scored))

    if "context" in sections:
        print("== context_pairs components ==", flush=True)
        from etl_excel_to_hyper_tableau_spark.streaming.events import (
            context_pairs,
        )
        ev = entry._t(spark, sf_dir, "events")
        ev.count()
        sc.setJobDescription("context_pairs full entry")
        timed("context_pairs entry (toPandas)",
              lambda: qs["context_pairs"](spark, sf_dir).toPandas())
        sc.setJobDescription("context_pairs operator")
        timed("operator -> noop",
              lambda: noop(context_pairs(ev, "user_id", "ts",
                                         "event_type", "event_id", k=3)))
        sc.setJobDescription("context_pairs scan")
        timed("events scan -> noop",
              lambda: noop(ev.select("user_id", "ts", "event_type",
                                     "event_id")))

    if "cdc" in sections:
        print("== cdc_latest_events components ==", flush=True)
        from etl_excel_to_hyper_tableau_spark.operators.cdc import (
            latest_snapshot,
        )
        ev = entry._t(spark, sf_dir, "events")
        ev.count()
        sc.setJobDescription("cdc full entry")
        timed("cdc_latest_events entry (toPandas)",
              lambda: qs["cdc_latest_events"](spark, sf_dir).toPandas())
        sc.setJobDescription("cdc operator")
        timed("latest_snapshot -> noop",
              lambda: noop(latest_snapshot(ev, key="user_id", ts="ts",
                                           tiebreak="event_id")))

    spark.stop()


if __name__ == "__main__":
    main()
