"""Round-11 session isolation harness #4 (guide §1.4 noop sink, §1.5
labels): interleaved old-vs-new at sf1 for the two tail rewrites —

* segment_dedup: digest-only election (impl='digest') vs text-carrying
  election (impl='text', the measured-faster default — the digest
  rewrite is a recorded negative result on local[32]);
* mmr_select: 100k-valve vectorized driver greedy (new) vs the 5k
  valve that forced the k-round cluster argmax path at sf1 (old).

Usage: python tools/isolate_r11d.py [sf_dir] [section ...]
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


def timed(label, fn, n=1):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:58s} {' '.join(f'{t:.3f}' for t in ts)}"
          f"  (min {min(ts):.3f}s)  load {os.getloadavg()[0]:.2f}",
          flush=True)
    return min(ts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sections = set(sys.argv[2:]) or {"segment", "mmr"}
    spark = get_spark(app_name="isolate_r11d")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    if "segment" in sections:
        from etl_excel_to_hyper_tableau_spark.operators.dedup import (
            segment_dedup,
        )
        docs = entry._t(spark, sf_dir, "documents")
        docs.count()
        print("== segment_dedup, interleaved text-carry (default) vs "
              "digest election ==", flush=True)
        for _ in range(4):
            sc.setJobDescription("segment_dedup text-carry")
            timed("text segment_dedup (toPandas)",
                  lambda: segment_dedup(docs, "text", "doc_id",
                                        seg_tokens=10, impl="text")
                  .orderBy("doc_id").toPandas())
            sc.setJobDescription("segment_dedup digest")
            timed("digest segment_dedup (toPandas)",
                  lambda: segment_dedup(docs, "text", "doc_id",
                                        seg_tokens=10, impl="digest")
                  .orderBy("doc_id").toPandas())

    if "mmr" in sections:
        from etl_excel_to_hyper_tableau_spark.operators import (
            similarity as sim,
        )
        emb = entry._t(spark, sf_dir, "embeddings")
        emb.count()
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        q = [float(x) for x in qv]
        corpus = emb.filter(F.col("vec_id") >= 3)
        print("== mmr_topk, interleaved old (5k valve -> cluster rounds) "
              "vs new (100k valve -> vectorized local) ==", flush=True)
        for _ in range(4):
            sc.setJobDescription("mmr OLD 5k valve (cluster rounds)")
            timed("old mmr_topk max_local=5000 (collect)",
                  lambda: sim.mmr_topk(corpus, "embedding", "vec_id", q,
                                       k=5, lam=0.7,
                                       max_local=5_000).collect())
            sc.setJobDescription("mmr NEW 100k valve (local greedy)")
            timed("new mmr_topk default valve (collect)",
                  lambda: sim.mmr_topk(corpus, "embedding", "vec_id", q,
                                       k=5, lam=0.7).collect())
        # cross-path value identity at this scale (the bit-exactness
        # claim, checked on the real corpus, not just the unit fixture)
        a = sim.mmr_topk(corpus, "embedding", "vec_id", q, k=5, lam=0.7,
                         max_local=5_000).collect()
        b = sim.mmr_topk(corpus, "embedding", "vec_id", q, k=5,
                         lam=0.7).collect()
        same = sorted(map(tuple, a)) == sorted(map(tuple, b))
        print(f"cluster-path vs vectorized-local identical: {same}",
              flush=True)
        if not same:
            raise SystemExit("PATH MISMATCH")

    spark.stop()


if __name__ == "__main__":
    main()
