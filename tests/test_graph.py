"""Generic connected components (operators/graph.py) on crafted graphs:
chains (diameter stress), disjoint components, cycles, duplicate and
self edges, direction-independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.operators.graph import (
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_two_components_and_cycle(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1),      # cycle → one component
                      (10, 11), (11, 12)])          # chain
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_chain_diameter(spark):
    # a 12-node path needs several propagation rounds
    got = _cc(spark, [(i, i + 1) for i in range(1, 12)])
    assert set(got.values()) == {1} and len(got) == 12


def test_direction_and_duplicates_irrelevant(spark):
    a = _cc(spark, [(5, 9), (9, 5), (5, 5), (9, 7)])
    b = _cc(spark, [(9, 5), (7, 9)])
    assert a == b == {5: 5, 9: 5, 7: 5}


def test_max_iterations_raises_not_half_merged(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(spark, [(i, i + 1) for i in range(1, 20)], max_iterations=2)


def test_dedup_clusters_delegates_consistently(spark):
    """duplicate_clusters output equals running the generic operator on
    its own pair list (the refactor changed no values)."""
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        duplicate_clusters, ngram_jaccard_pairs,
    )
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base + f" tail{i % 4}") for i in range(1, 17)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clusters = {(r["doc_id"], r["cluster_id"])
                for r in duplicate_clusters(df, "text", "doc_id",
                                            threshold=0.5).collect()}
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5,
                                max_df=100).select("id_a", "id_b")
    generic = {(r["id"], r["component"])
               for r in connected_components(pairs, "id_a", "id_b").collect()}
    assert clusters == generic and clusters


def test_pagerank_matches_python_reference(spark):
    from etl_excel_to_hyper_tableau_spark.operators.graph import pagerank
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["pagerank"]
           for r in pagerank(df, iterations=3, damping=0.85).collect()}

    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += pr[s] / outdeg[s]
        pr = {v: (1.0 - 0.85) / n + 0.85 * contrib[v] for v in nodes}
    for v in nodes:
        assert abs(got[v] - pr[v]) < 1e-12, (v, got[v], pr[v])
    # the hub (3) outranks everyone; dangling mass decays (sum < 1)
    assert got[3] == max(got.values())
    assert sum(got.values()) < 1.0


def test_pagerank_zero_iterations_is_uniform(spark):
    from etl_excel_to_hyper_tableau_spark.operators.graph import pagerank
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["id"]: r["pagerank"]
           for r in pagerank(df, iterations=0).collect()}
    assert got == {1: 0.5, 2: 0.5}
