"""Interval joins (as-of, binned range) and IVF ANN: result equality
against the naive theta-join / exact-scan formulations, plan property
(no nested-loop join in the accelerated forms), and the Lloyd-iteration
training path."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.operators.interval import (
    asof_join,
    range_join_binned,
)
from etl_excel_to_hyper_tableau_spark.operators.similarity import (
    ivf_topk,
    topk_cosine_batch,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _asof_reference(left, right, key, ts):
    """Naive theta-join + argmax reference for backward as-of."""
    r = right.select(F.col(key).alias("__rk__"), F.col("ts").alias("r_ts"),
                     F.col("v").alias("r_v"))
    j = left.join(r, (left[key] == r["__rk__"]) & (left[ts] >= r["r_ts"]))
    w = (j.groupBy(*[left[c] for c in left.columns])
         .agg(F.max(F.struct("r_ts", "r_v")).alias("m")))
    return w.select(*left.columns, F.col("m.r_ts").alias("r_ts"),
                    F.col("m.r_v").alias("r_v"))


def test_asof_backward_matches_theta_reference(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        "k long, ts long, payload string")
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, 200.0), (1, 25, 300.0), (2, 1, 400.0)],
        "k long, ts long, v double")
    got = asof_join(left, right, key="k", ts="ts", right_prefix="r_") \
        .withColumnRenamed("r_ts", "r_ts").withColumnRenamed("r_v", "r_v")
    ref = _asof_reference(left, right, "k", "ts")
    # k=3 has no match anywhere; k=1 ts=20 matches the ts=20 right row
    assert _rows(got) == _rows(ref)
    assert got.filter(F.col("k") == 3).count() == 0
    tie = {r["ts"]: r["r_ts"] for r in got.filter(F.col("k") == 1).collect()}
    assert tie[20] == 20  # equal timestamp is visible (>= semantics)


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 10), (1, 30)], "k long, ts long")
    right = spark.createDataFrame([(1, 15, 1.0), (1, 25, 2.0)],
                                  "k long, ts long, v double")
    got = asof_join(left, right, key="k", ts="ts", direction="forward")
    m = {r["ts"]: (r["r_ts"], r["r_v"]) for r in got.collect()}
    assert m == {10: (15, 1.0)}  # ts=30 has no later right row → dropped


def test_asof_plan_has_no_theta_join(spark, sf_dir):
    import __spark_entry__ as entry
    plan = _plan(entry.queries()["asof_purchase_click"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_matches_between_reference(spark):
    points = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") * 3.7).alias("x"))
    ranges = spark.range(30).select(
        F.col("id").alias("rid"), (F.col("id") * 20.0).alias("lo"),
        (F.col("id") * 20.0 + 45.0).alias("hi"))  # overlapping
    got = range_join_binned(points, ranges, "x", "lo", "hi", bin_width=25.0)
    ref = points.join(ranges, (F.col("x") >= F.col("lo"))
                      & (F.col("x") <= F.col("hi")))
    assert _rows(got.select("pid", "rid")) == _rows(ref.select("pid", "rid"))


def test_range_join_bounds_inclusive(spark):
    points = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid long, x double")
    ranges = spark.createDataFrame([(7, 10.0, 20.0)], "rid long, lo double, hi double")
    got = range_join_binned(points, ranges, "x", "lo", "hi", bin_width=5.0)
    assert got.count() == 2


def test_ivf_recall_against_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    exact = topk_cosine_batch(corpus, queries, "embedding", "vec_id",
                              "embedding", "vec_id", k=5)
    approx = ivf_topk(corpus, queries, "embedding", "vec_id",
                      "embedding", "vec_id", k=5, n_cells=8, nprobe=4)
    ex = {(r["query_id"], r["id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["id"]) for r in approx.collect()}
    # nprobe=4 of 8 cells: expect at least half the exact neighbors found
    assert len(ex & ap) >= len(ex) // 2
    # every query returns exactly k ranked candidates (corpus ≫ k per cell)
    assert approx.groupBy("query_id").count().filter("count <> 5").count() == 0


def test_ivf_staged_partition_pruning(spark, sf_dir, tmp_path):
    """The staged layout (stage_ivf → parquet partitioned by cell) must
    (a) return the same values as the in-memory ivf_topk with the same
    centroids, and (b) prune the scan to the probed cells — dynamic
    partition pruning from the broadcast probe join."""
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        ivf_topk_staged, stage_ivf,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    path = str(tmp_path / "ivf")
    cents = stage_ivf(corpus, "embedding", "vec_id", path, n_cells=8)
    staged = ivf_topk_staged(spark, path, cents, queries,
                             "embedding", "vec_id", k=5, nprobe=2)
    mem = ivf_topk(corpus, queries, "embedding", "vec_id",
                   "embedding", "vec_id", k=5, n_cells=8, nprobe=2)
    assert _rows(staged) == _rows(mem)
    # the parquet scan is restricted to probed cells at runtime
    plan = _plan(staged)
    assert "dynamicpruning" in plan.lower() or "PartitionFilters" in plan


def test_ivf_train_iters_runs_and_keeps_contract(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 2)
    corpus = emb.filter(F.col("vec_id") >= 2)
    out = ivf_topk(corpus, queries, "embedding", "vec_id",
                   "embedding", "vec_id", k=3, n_cells=4, nprobe=2,
                   train_iters=2)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    for r in rows:
        assert 1 <= r["rank"] <= 3


def test_ivfpq_full_probe_full_refine_equals_exact(spark, sf_dir):
    """With every cell probed and the refine shortlist covering the
    whole probed set, the exact re-rank must reproduce the exact top-k
    (the ADC stage then only orders the shortlist, never drops a true
    neighbor)."""
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        ivfpq_topk,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    n = corpus.count()
    exact = topk_cosine_batch(corpus, queries, "embedding", "vec_id",
                              "embedding", "vec_id", k=5)
    got = ivfpq_topk(corpus, queries, "embedding", "vec_id",
                     "embedding", "vec_id", k=5, n_cells=4, nprobe=4,
                     m=4, n_codes=8, refine=n)
    ex = {(r["query_id"], r["id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["id"]) for r in got.collect()}
    assert ex == ap


def test_ivfpq_adc_only_matches_pq_when_all_cells_probed(spark, sf_dir):
    """refine=0 with nprobe=n_cells degenerates to pq_topk (same
    codebooks, same ADC, no cell restriction)."""
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        ivfpq_topk, pq_topk,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    pq = {(r["query_id"], r["id"], r["adc_dist"])
          for r in pq_topk(corpus, queries, "embedding", "vec_id",
                           "embedding", "vec_id", k=5, m=4,
                           n_codes=8).collect()}
    comp = {(r["query_id"], r["id"], r["adc_dist"])
            for r in ivfpq_topk(corpus, queries, "embedding", "vec_id",
                                "embedding", "vec_id", k=5, n_cells=4,
                                nprobe=4, m=4, n_codes=8,
                                refine=0).collect()}
    assert pq == comp


def test_ivfpq_validation_and_candidate_bound(spark, sf_dir):
    import pytest as _pytest

    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        ivfpq_topk,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    with _pytest.raises(ValueError):
        ivfpq_topk(corpus, queries, "embedding", "vec_id",
                   "embedding", "vec_id", k=5, refine=3)
    with _pytest.raises(ValueError):
        ivfpq_topk(corpus, queries, "embedding", "vec_id",
                   "embedding", "vec_id", max_queries=1)
    got = ivfpq_topk(corpus, queries, "embedding", "vec_id",
                     "embedding", "vec_id", k=5, refine=20)
    assert got.groupBy("query_id").count().filter("count > 5").count() == 0


def test_recall_vs_exact_perfect_candidates(spark, sf_dir):
    """Feeding the exact top-k back as candidates must report
    recall 1.0 for every query (gauge self-consistency)."""
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        recall_vs_exact,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    exact = topk_cosine_batch(corpus, queries, "embedding", "vec_id",
                              "embedding", "vec_id", k=5)
    rep = recall_vs_exact(corpus, queries, "embedding", "vec_id",
                          "embedding", "vec_id", exact, k=5).collect()
    assert len(rep) == 3
    assert all(r["recall"] == 1.0 and r["n_hits"] == 5 for r in rep)


def test_ivfpq_staged_matches_inmemory_and_prunes(spark, sf_dir, tmp_path):
    """stage_ivfpq -> ivfpq_topk_staged must (a) return the exact rows
    of the in-memory ivfpq_topk with the same parameters, (b) carry a
    STATIC cell partition filter (the probe set is driver-known, so
    the file index never lists un-probed cell directories), and (c)
    contain no codebook/centroid literals in the probe plan."""
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        ivfpq_topk, ivfpq_topk_staged, stage_ivfpq,
    )
    from etl_excel_to_hyper_tableau_spark.plans.pruning import (
        static_partition_filter_count,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    path = str(tmp_path / "ivfpq")
    cents, books = stage_ivfpq(corpus, "embedding", "vec_id", path,
                               n_cells=8, m=4, n_codes=8)
    staged = ivfpq_topk_staged(spark, path, cents, books, queries,
                               "embedding", "vec_id", k=5, nprobe=2,
                               refine=10)
    mem = ivfpq_topk(corpus, queries, "embedding", "vec_id",
                     "embedding", "vec_id", k=5, n_cells=8, nprobe=2,
                     m=4, n_codes=8, refine=10)
    assert _rows(staged) == _rows(mem)
    assert static_partition_filter_count(staged, "cell") == 1
    plan = _plan(staged)
    # no centroid/codebook LITERALS compile into the probe plan: the
    # coarse-assignment expression ('negcell' structs) and the PQ
    # encode expression (array_position argmin over literal centroid
    # arrays) are both build-time-only — the column-to-column refine
    # cosine is the only fold left
    assert "negcell" not in plan
    assert "array_position" not in plan


def test_ivfpq_staged_pin_columns(spark, sf_dir, tmp_path):
    from etl_excel_to_hyper_tableau_spark.operators.similarity import (
        ivfpq_topk_staged, stage_ivfpq,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3)
    path = str(tmp_path / "ivfpq_pin")
    cents, books = stage_ivfpq(corpus, "embedding", "vec_id", path,
                               n_cells=8, m=4, n_codes=8)
    out = ivfpq_topk_staged(spark, path, cents, books, queries,
                            "embedding", "vec_id", k=3, nprobe=2,
                            refine=0, pin_probe_stats=True).collect()
    assert out
    cells = {r["n_cells_probed"] for r in out}
    assert len(cells) == 1 and 1 <= cells.pop() <= 6  # <= queries*nprobe
    assert all(r["pruning_filters"] == 1 for r in out)
    assert all(r["cosine"] is None for r in out)  # refine=0 contract
