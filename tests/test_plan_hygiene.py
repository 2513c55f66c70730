"""Plan-hygiene sweep over EVERY inventory query: no accidental
cartesian products or nested-loop joins anywhere in the shipped plans —
the whole-inventory generalization of the per-operator plan assertions
(skew, sampling, groups-frames, as-of).

Streaming entries are excluded because constructing them executes the
stream (availableNow run); their plan properties are pinned by the
dedicated streaming tests instead.
"""

import contextlib
import io

import __spark_entry__ as entry

# intentional nested-loops: embedding_topk's / hard_negatives' exact
# scans are a crossJoin against the BROADCAST query set — the corpus
# never shuffles and only (queries × k) rows leave the scan
# (similarity.py docstrings); doc_lm_surprisal / bm25_search /
# negative_samples / embedding_quantize / tfidf_topk / mixture_weights
# cross-join a broadcast ONE-ROW aggregate (corpus totals / per-dim
# calibration stats / doc counts / Σ and Σ√ scalars)
NESTED_LOOP_OK = {"embedding_topk", "doc_lm_surprisal", "bm25_search",
                  # knn_graph's EXACT form is a deliberate valved
                  # crossJoin (max_exact guard; the sign-LSH bucketed
                  # self-join is the scale path and is pinned
                  # broadcast-free in tests/test_round6_ops.py)
                  "knn_graph",
                  "negative_samples", "hard_negatives",
                  # maxsim_rerank: the ColBERT re-ranker scores the
                  # corpus against the BROADCAST tokenized query set —
                  # same shape as embedding_topk/hard_negatives (and at
                  # scale it runs over an ANN shortlist, not the corpus)
                  "maxsim_rerank",
                  # rrf_hybrid: its two input systems are
                  # topk_cosine_batch scans (broadcast query set —
                  # embedding_topk's exact shape); the fusion itself is
                  # a union + hash agg with no join at all
                  "rrf_hybrid",
                  "embedding_quantize", "tfidf_topk", "mixture_weights",
                  "ann_recall", "ann_mrr", "pq_topk", "key_skew",
                  # ivfpq_recall: the gauge's EXACT operand is a
                  # topk_cosine_batch scan (broadcast query set —
                  # ann_recall's shape); the IVF-PQ candidate side
                  # itself is equi-joins only (cell probe + LUT)
                  "ivfpq_recall",
                  # hll_distinct cross-joins its ONE-ROW estimate with
                  # the ONE-ROW exact-NDV aggregate per key column
                  "hll_distinct",
                  # round-4: dsir_weights / vocab_drift cross-join
                  # broadcast ONE-ROW totals (tot_t/tot_r, tot_a/tot_b);
                  # corpus_summary cross-joins its one-row doc/token
                  # totals into the metadata-sized lang/source aggs;
                  # dup_graph_stats combines its three ONE-ROW census
                  # aggregates (stats × n_edges × triangles) the same way
                  "dsir_weights", "vocab_drift", "corpus_summary",
                  "dup_graph_stats",
                  # (sketch_profile left this list in round 10: its
                  # fused single-action shape is union + hash agg with
                  # no join at all)
                  # Q22 shape: scalar-subquery average = ONE-ROW
                  # broadcast cross join ahead of the anti-join
                  "idle_customer_balance",
                  # kmv_set_ops assembles ONE-ROW estimate aggregates
                  # (ndv_a × ndv_b × union × matches × the four exact
                  # counts) by broadcast cross join — every side is a
                  # single row by construction
                  "kmv_set_ops",
                  # grouped histogram quantiles: |groups| × |qs| target
                  # table built by broadcast cross join over the
                  # metadata-sized bounds/quantile tables
                  "lang_length_quantiles",
                  # group_split census cross-joins its ONE-ROW
                  # spanning-clusters invariant aggregate
                  "group_split",
                  # boilerplate_lines thresholds its census against the
                  # broadcast ONE-ROW corpus count (ceil(frac·n_docs))
                  "boilerplate_lines",
                  # Q11 shape: scalar-subquery global total = ONE-ROW
                  # broadcast cross join against the per-part aggregate
                  "important_part_value",
                  # NB classifier: vocabulary rows cross-join the
                  # broadcast ONE-ROW (T1,T0,V) totals; doc scores
                  # cross-join the broadcast ONE-ROW prior
                  "quality_classifier"}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_accidental_cartesian_or_nested_loop(spark, sf_dir):
    bad = []
    for name, fn in entry.queries().items():
        if name.startswith("stream_"):
            continue
        plan = _plan(fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
            bad.append((name, "BroadcastNestedLoopJoin"))
    assert bad == []


def test_new_maponly_operators_have_no_exchange(spark):
    """Operators documented map-only must compile without a shuffle:
    bloom_prune (literal-bitmap filter), pq_encode (literal codebooks),
    winnow/bpe_apply on a pre-partitioned input (spread() is a no-op
    when partitions already match parallelism)."""
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        pq_encode,
    )
    from etl_excel_to_hyper_tableau_spark.operators.skew import (
        bloom_filter_bits, bloom_prune,
    )
    from etl_excel_to_hyper_tableau_spark.operators.text import (
        bpe_apply, winnow_fingerprints,
    )
    par = spark.sparkContext.defaultParallelism

    small = spark.createDataFrame([(k,) for k in (1, 2)], "k long")
    bits = bloom_filter_bits(small, "k", n_bits=1 << 10)
    big = spark.range(100).select(F.col("id").alias("k"))
    assert "Exchange" not in _plan(bloom_prune(big, "k", bits,
                                               n_bits=1 << 10))

    # inputs carry their own repartition Exchange; the operator must
    # not ADD one (spread() is a no-op at matching parallelism)
    emb = (spark.range(40).repartition(par)
           .select(F.col("id"),
                   F.array(F.col("id").cast("double"),
                           F.lit(1.0)).alias("v")))
    base_ex = _plan(emb).count("Exchange")
    books1 = [[[0.0], [5.0]], [[1.0], [2.0]]]
    assert _plan(pq_encode(emb, "v", "id", books1)).count("Exchange") == base_ex

    docs = (spark.range(50).repartition(par)
            .select(F.col("id"), F.lit("some text here").alias("text")))
    base_ex = _plan(docs).count("Exchange")
    assert _plan(winnow_fingerprints(docs, "text", "id")) \
        .count("Exchange") == base_ex
    assert _plan(bpe_apply(docs, "text", "id", [("s", "o"), ("t", "e")])) \
        .count("Exchange") == base_ex
