"""Exact prefix-filtered Jaccard join: zero-false-negative contract vs
a brute-force reference, filter semantics, and boundary thresholds."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row

from etl_excel_to_hyper_tableau_spark.operators.dedup import jaccard_join


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def _brute(texts, t):
    sets = [set(x.split()) for x in texts]
    out = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out[(a, b)] = inter / union
    return out

def test_matches_brute_force(spark):
    texts = [
        "a b c d e",
        "a b c d e",          # identical → 1.0
        "a b c d f",          # 4/6
        "a b c d e f",        # 5/6
        "x y z",              # disjoint
        "x y z w",            # 3/4 with previous
        "q",                  # singleton
    ]
    for t in (0.5, 0.75, 0.8, 1.0):
        got = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in jaccard_join(_docs(spark, texts), "text",
                                     "doc_id", t).collect()}
        want = _brute(texts, t)
        assert got.keys() == want.keys(), f"t={t}"
        for k, v in want.items():
            assert got[k] == pytest.approx(v), f"t={t} {k}"


def test_boundary_threshold_float_fuzz(spark):
    # 19 shared of 20 union = 0.95 exactly (A ⊂ B) — the binary-float
    # hazard the epsilon guards exist for: the length filter compares
    # |A|=19 against t·|B| where 0.95·20 in doubles can land a hair
    # above 19, and ceil(t·sz) can shorten the prefix by one
    base = [f"w{i}" for i in range(19)]
    texts = [" ".join(base), " ".join(base + ["extra"])]
    got = jaccard_join(_docs(spark, texts), "text", "doc_id",
                       0.95).collect()
    assert len(got) == 1
    assert got[0]["jaccard"] == pytest.approx(19 / 20)


def test_exactness_on_corpus_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    rows = docs.collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    got = {(r["id_a"], r["id_b"]) for r in
           jaccard_join(docs, "text", "doc_id", 0.9).collect()}
    sets = {k: set(v.split()) for k, v in texts.items()}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= 0.9:
            want.add((a, b))
    assert got == want
    assert want  # the corpus plants near-dups: the test must see some


def test_agrees_with_ngram_jaccard_pairs(spark, sf_dir):
    # two INDEPENDENT exact implementations of the same measure —
    # prefix-filtered candidate join vs full inverted-index join —
    # must produce identical pair sets and values on shared input
    from etl_excel_to_hyper_tableau_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    a = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in
         jaccard_join(docs, "text", "doc_id", 0.5, ngrams=3).collect()}
    b = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in
         ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                             threshold=0.5).collect()}
    assert a == b
    assert a  # the corpus plants near-dups: agreement on ∅ proves little


def test_threshold_validation(spark):
    with pytest.raises(ValueError):
        jaccard_join(_docs(spark, ["a"]), "text", "doc_id", 0.0)
    with pytest.raises(ValueError):
        jaccard_join(_docs(spark, ["a"]), "text", "doc_id", 1.5)
