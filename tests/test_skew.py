"""Skew-handling operators: salted join correctness (result-equality
with the plain join under a pathologically hot key) and bucketed
staging (the co-located-join plan property: no Exchange on either
side of an equi-join between two tables bucketed on the join key)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.operators.skew import (
    read_bucketed,
    salted_join,
    stage_bucketed,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows share one hot key — the shape AQE alone can't
    # rebalance (it can split a partition, not a key).
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))

    plain = fact.join(dim, "k", "inner")
    salted = salted_join(fact, dim, "k", salt_factor=8)

    assert salted.columns == plain.columns
    assert _rows(salted) == _rows(plain)


def test_salted_join_left_outer_preserves_unmatched(spark):
    fact = spark.range(100).select((F.col("id") % 60).alias("k"),
                                   F.col("id").alias("v"))
    dim = spark.range(50).select(F.col("id").alias("k"),
                                 F.lit("x").alias("name"))
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, "k", salt_factor=4, how="left")
    assert _rows(salted) == _rows(plain)


def test_salted_join_rejects_bad_factor(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    try:
        salted_join(df, df, "k", salt_factor=0)
    except ValueError:
        return
    raise AssertionError("salt_factor=0 must raise")


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    # Both sides bucketed on the join key with the same bucket count:
    # the sort-merge join must run with zero Exchange operators.
    orders = spark.range(200).select(
        F.col("id").alias("o_custkey"), (F.col("id") * 3).alias("o_total"))
    cust = spark.range(100).select(
        F.col("id").alias("c_custkey"), F.concat(F.lit("c"), F.col("id")).alias("c_name"))

    stage_bucketed(orders, "bkt_orders", "o_custkey", buckets=4)
    stage_bucketed(cust, "bkt_cust", "c_custkey", buckets=4, sort_by="c_custkey")

    left = read_bucketed(spark, "bkt_orders")
    right = read_bucketed(spark, "bkt_cust")
    # disable broadcast so the co-location (not a broadcast) is what
    # removes the shuffle
    joined = left.hint("merge").join(
        right, left.o_custkey == right.c_custkey, "inner")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert _rows(joined.select("o_custkey", "o_total", "c_name")) == _rows(
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_custkey", "o_total", "c_name"))

    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_cust")


def test_key_skew_report_flags_hot_key(spark):
    from etl_excel_to_hyper_tableau_spark.operators.skew import key_skew_report
    rows = [(1, "hot")] * 60 + [(i, f"k{i}") for i in range(2, 42)]
    df = spark.createDataFrame(
        [(i, k) for i, (_, k) in enumerate(rows)], "id long, k string")
    out = key_skew_report(df, "k", topk=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    top = out[0]
    assert top["key_value"] == "hot" and top["n_rows"] == 60
    assert top["share"] == 60 / 100
    # 41 distinct keys; uniform load would be 100/41 rows per key
    assert top["hot_factor"] == 60 * 41 / 100
    # the uniform tail keys sit at hot_factor < 1
    assert all(r["hot_factor"] < 1 for r in out[1:])


def test_key_skew_report_plan_is_take_ordered(spark):
    """Top-k must compile to TakeOrderedAndProject, not a global-rank
    window (single reducer over key cardinality)."""
    import contextlib, io
    from etl_excel_to_hyper_tableau_spark.operators.skew import key_skew_report
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        key_skew_report(df, "k", topk=3).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_bloom_prune_never_false_negative_and_join_unchanged(spark):
    from etl_excel_to_hyper_tableau_spark.operators.skew import (
        bloom_filter_bits, bloom_prune,
    )
    small = spark.createDataFrame([(k,) for k in (3, 7, 500)], "k long")
    big = spark.createDataFrame([(i, i % 1000) for i in range(5000)],
                                "id long, k long")
    bits = bloom_filter_bits(small, "k", n_bits=1 << 12, n_hashes=3)
    pruned = bloom_prune(big, "k", bits, n_bits=1 << 12, n_hashes=3)
    kept = set(r["k"] for r in pruned.select("k").distinct().collect())
    # no false negatives: every member key survives
    assert {3, 7, 500} <= kept
    # the prune actually prunes (selective filter on 1000 keys)
    assert len(kept) < 1000
    # pruned join == plain join, row for row
    plain = big.join(small, "k").select("id").collect()
    viabloom = pruned.join(small, "k").select("id").collect()
    assert sorted(r["id"] for r in plain) == sorted(r["id"] for r in viabloom)


def test_bloom_bits_signed_int64_roundtrip(spark):
    """Words with bit 63 set must survive the long-literal round trip
    (two's complement) — probe enough keys that high bits are hit."""
    from etl_excel_to_hyper_tableau_spark.operators.skew import (
        bloom_filter_bits, bloom_prune,
    )
    keys = list(range(200))
    small = spark.createDataFrame([(k,) for k in keys], "k long")
    bits = bloom_filter_bits(small, "k", n_bits=256, n_hashes=2)
    assert any(w < 0 for w in bits)  # bit 63 somewhere -> signed repr
    pruned = bloom_prune(small, "k", bits, n_bits=256, n_hashes=2)
    assert pruned.count() == len(keys)  # all members pass
