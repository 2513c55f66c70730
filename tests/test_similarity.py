"""Similarity search: exact top-k (single + batch) and the sign-LSH
approximate path."""

import math

import pytest

from etl_excel_to_hyper_tableau_spark.operators.similarity import (
    ann_topk_lsh, topk_cosine, topk_cosine_batch,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 2-D vectors at known angles → cosine to [1, 0] is just cos(theta)
    rows = [(i, [math.cos(math.radians(10 * i)), math.sin(math.radians(10 * i))])
            for i in range(10)]
    return spark.createDataFrame(rows, "id long, emb array<double>")


def test_topk_cosine_exact_order(corpus):
    out = topk_cosine(corpus, "emb", "id", [1.0, 0.0], k=3).collect()
    assert [r["id"] for r in out] == [0, 1, 2]
    assert out[0]["cosine"] == pytest.approx(1.0)
    assert out[1]["cosine"] == pytest.approx(math.cos(math.radians(10)))


def test_topk_cosine_batch(spark, corpus):
    qs = spark.createDataFrame(
        [(100, [1.0, 0.0]), (200, [0.0, 1.0])],
        "qid long, qv array<double>")
    out = topk_cosine_batch(corpus, qs, "emb", "id", "qv", "qid", k=2)
    got = {(r["query_id"], r["rank"]): r["id"] for r in out.collect()}
    assert got[(100, 1)] == 0 and got[(100, 2)] == 1
    assert got[(200, 1)] == 9 and got[(200, 2)] == 8
    assert len(got) == 4


def test_ann_topk_subset_of_exact(spark, corpus):
    qs = spark.createDataFrame([(1, [1.0, 0.05])], "qid long, qv array<double>")
    ann = ann_topk_lsh(corpus, qs, "emb", "id", "qv", "qid", k=3, planes=4)
    rows = ann.collect()
    assert 0 < len(rows) <= 3
    assert all(r["query_id"] == 1 for r in rows)
    # rank-1 hit must be the true nearest neighbor (id 0 at ~3°)
    top = min(rows, key=lambda r: r["rank"])
    assert top["id"] == 0
