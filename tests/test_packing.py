"""Sequence packing: the distributed prefix sum must equal the naive
single-window formulation row-for-row, on multi-partition input."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from etl_excel_to_hyper_tableau_spark.operators.packing import pack_sequences
from etl_excel_to_hyper_tableau_spark.operators.text import tokens


def _naive(df, window_tokens):
    """Single-ordered-window reference (fine at test scale)."""
    sized = df.select(F.col("id"),
                      F.size(tokens(F.col("text"))).cast("long").alias("n"))
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    c = sized.withColumn("cum", F.sum("n").over(w))
    rows = {}
    for r in c.collect():
        start = r["cum"] - r["n"]
        if r["n"] > 0:
            end_w = (r["cum"] - 1) // window_tokens
        else:
            end_w = start // window_tokens
        rows[r["id"]] = (r["n"], start, start // window_tokens,
                         start % window_tokens, end_w,
                         (end_w - start // window_tokens + 1) if r["n"] > 0 else 0)
    return rows


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]
    ).repartition(4)  # scatter across partitions before the range sort


def test_pack_matches_naive_prefix_sum(spark):
    texts = [" ".join(f"w{j}" for j in range(n))
             for n in [5, 0, 300, 17, 256, 1, 511, 2, 40, 256, 0, 700]]
    df = _docs(spark, texts)
    got = {r["id"]: (r["n_tokens"], r["start_offset"], r["start_window"],
                     r["offset_in_window"], r["end_window"], r["n_windows"])
           for r in pack_sequences(df, "text", "id", window_tokens=256,
                                   num_partitions=3).collect()}
    assert got == _naive(df, 256)


def test_pack_offsets_are_contiguous(spark):
    texts = [" ".join(["x"] * n) for n in [10, 20, 1, 99, 256, 3]]
    df = _docs(spark, texts)
    rows = sorted(pack_sequences(df, "text", "id", window_tokens=64).collect(),
                  key=lambda r: r["id"])
    off = 0
    for r in rows:
        assert r["start_offset"] == off
        off += r["n_tokens"]


def test_pack_empty_doc_spans_zero_windows(spark):
    df = _docs(spark, ["a b c", "", "d"])
    rows = {r["id"]: r for r in
            pack_sequences(df, "text", "id", window_tokens=4).collect()}
    assert rows[1]["n_windows"] == 0 and rows[1]["n_tokens"] == 0
    assert rows[1]["start_offset"] == 3  # carries the boundary position


def test_window_doc_map_inverts_packing(spark):
    from etl_excel_to_hyper_tableau_spark.operators.packing import (
        pack_sequences, window_doc_map,
    )
    # 3 docs of 100 tokens each, window 64: doc1 spans w0-w1, doc2
    # w1-w3, doc3 w3-w4
    rows = [(i, " ".join(["t"] * 100)) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "id long, text string")
    packed = {r["id"]: r for r in
              pack_sequences(df, "text", "id", window_tokens=64).collect()}
    out = window_doc_map(df, "text", "id", window_tokens=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for doc_id, rws in by_doc.items():
        wins = sorted(r["window_id"] for r in rws)
        p = packed[doc_id]
        assert wins == list(range(p["start_window"], p["end_window"] + 1))
        for r in rws:
            expect = (p["offset_in_window"]
                      if r["window_id"] == p["start_window"] else 0)
            assert r["offset_in_window"] == expect
    # every row carries the doc's token count
    assert all(r["n_tokens"] == 100 for r in out)


def test_window_doc_map_skips_empty_docs(spark):
    from etl_excel_to_hyper_tableau_spark.operators.packing import window_doc_map
    df = spark.createDataFrame([(1, "a b"), (2, ""), (3, "c")],
                               "id long, text string")
    out = window_doc_map(df, "text", "id", window_tokens=4).collect()
    assert sorted(set(r["id"] for r in out)) == [1, 3]


def test_seq_packing_empty_input(spark):
    """Empty corpus must yield an empty result, not an analysis error
    (the untyped empty-map offset literal regression)."""
    from etl_excel_to_hyper_tableau_spark.operators.packing import (
        pack_sequences,
    )
    df = spark.createDataFrame([], "doc_id long, text string")
    out = pack_sequences(df, "text", "doc_id", window_tokens=64)
    assert out.count() == 0
