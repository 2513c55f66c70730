"""The engine's vector stack on one page — every layer a 100 TB
embedding deployment runs, over the testdata embeddings:

    exact top-k (verification baseline) → sign-LSH ANN (+ recall@k and
    MRR gauges) → IVF staging (partition-pruned probes) → int8 scalar
    quantization → product quantization (ADC search) → semantic dedup
    (SemDeDup) → continuous index ingest

Every stage is one of the engine's oracle-verified operators; this
script just composes them.  Run:

    python examples/vector_search_example.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402
from etl_excel_to_hyper_tableau_spark.operators import similarity as sim  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="vec_")
    spark = get_spark(app_name="vector_search_example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)

    # 1. exact top-k — the correctness baseline (corpus never shuffles)
    exact = sim.topk_cosine_batch(corpus, queries, "embedding", "vec_id",
                                  "embedding", "vec_id", k=5)
    n_exact = exact.count()

    # 2. sign-LSH ANN + its quality gauges (multiprobe, coarse planes —
    # the recall-leaning configuration; the oracle entries pin the
    # stricter bucket-exact one)
    recall = sim.ann_recall_report(corpus, queries, "embedding", "vec_id",
                                   "embedding", "vec_id", k=5, planes=4,
                                   multiprobe=True)
    mean_recall = recall.agg(F.avg("recall")).first()[0]
    mrr = sim.ann_mrr_report(corpus, queries, "embedding", "vec_id",
                             "embedding", "vec_id", k=5, planes=4,
                             multiprobe=True)
    mean_rr = mrr.agg(F.avg("rr")).first()[0]

    # 3. IVF staged to parquet partitioned by cell — probes prune at
    # the scan (the sub-linear search layout)
    cents = sim.stage_ivf(corpus, "embedding", "vec_id",
                          f"{work}/ivf", n_cells=16)
    staged = sim.ivf_topk_staged(spark, f"{work}/ivf", cents, queries,
                                 "embedding", "vec_id", k=5, nprobe=2)
    n_staged = staged.count()

    # 4. int8 scalar quantization — 4x memory cut, exact MSE audit
    quant = sim.quantize_embeddings_int8(corpus, "embedding", "vec_id")
    mean_mse = quant.agg(F.avg("mse")).first()[0]

    # 5. product quantization — m bytes per vector, ADC search
    pq = sim.pq_topk(corpus, queries, "embedding", "vec_id",
                     "embedding", "vec_id", k=5, m=4, n_codes=8)
    n_pq = pq.count()

    # 6. semantic dedup (SemDeDup) — production sub-bucketed path
    sem = sim.semantic_dedup(emb, "embedding", "vec_id",
                             n_cells=16, threshold=0.5, lsh_planes=None)
    n_kept = sem.filter("keep").count()
    n_all = sem.count()

    print(f"exact top-k rows {n_exact}; LSH recall@5 {mean_recall:.2f}, "
          f"MRR {mean_rr:.2f}; staged-IVF rows {n_staged}; "
          f"int8 mean MSE {mean_mse:.2e}; PQ rows {n_pq}; "
          f"semantic dedup keeps {n_kept}/{n_all}")
    spark.stop()


if __name__ == "__main__":
    main()
