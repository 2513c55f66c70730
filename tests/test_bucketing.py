"""Bucketed tables: the one-time write shuffle buys exchange-free
co-located joins (plans/bucketing.py) — values identical to the plain
join, physical plan asserted shuffle-free."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.plans.bucketing import (
    co_located_join, join_exchanges, write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li.select("l_orderkey", "l_quantity",
                             "l_extendedprice"),
                   "b6_lineitem", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                                 "o_totalprice", "o_orderdate"),
                   "b6_orders", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    yield "b6_lineitem", "b6_orders"
    spark.sql("DROP TABLE IF EXISTS b6_lineitem")
    spark.sql("DROP TABLE IF EXISTS b6_orders")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # MERGE hint: at test scale AQE would broadcast the small side,
    # which is exchange-free for the wrong reason
    j = co_located_join(spark, lt, rt, ["l_orderkey"],
                        force_sort_merge=True)
    assert join_exchanges(j) == 0
    # the same join over plain parquet shuffles (or broadcasts —
    # either way the bucketed form's zero is the point being bought)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan


def test_bucketed_join_values_match_plain_join(spark, sf_dir,
                                               bucketed_tables):
    lt, rt = bucketed_tables
    got = (co_located_join(spark, lt, rt, ["l_orderkey"])
           .groupBy()
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity")).alias("sq")).collect()[0])
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = (li.join(orders,
                    li["l_orderkey"] == orders["o_orderkey"])
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity")).alias("sq")).collect()[0])
    assert got["n"] == want["n"]
    assert got["sq"] == want["sq"]


def test_bucketed_agg_on_key_is_exchange_free(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = (spark.table(lt).groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q")))
    assert join_exchanges(agg) == 0


def test_write_bucketed_validates(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(li, "b6_bad", ["l_orderkey"], 0)
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(li, "b6_bad", [], 4)


def test_bucketed_priority_census_matches_plain_q12(spark, sf_dir):
    # the round-8 entry: TPC-H Q12 semantics over the bucketed staging
    # must (a) plan the join with zero shuffle exchanges and (b) agree
    # value-for-value with the plain-table entry
    import __spark_entry__ as e

    b = {r["line_class"]: (r["high_line_count"], r["low_line_count"],
                           r["join_exchanges"])
         for r in e.queries()["bucketed_priority_census"](spark, sf_dir)
         .collect()}
    p = {r["line_class"]: (r["high_line_count"], r["low_line_count"])
         for r in e.queries()["line_priority_census"](spark, sf_dir)
         .collect()}
    assert set(b) == set(p) and len(b) > 0
    for k, (hi, lo, n_ex) in b.items():
        assert (hi, lo) == p[k]
        assert n_ex == 0


def test_staging_cache_keyed_by_sf_dir(spark):
    # regression (round-9 ADVICE): _stage_once keys on (app, name,
    # sf_dir) but the catalog tables used to carry FIXED names, so
    # running sf A, then B (overwrites the tables), then A again hit
    # the (app, name, A) cache entry and silently read B's data.  The
    # tagged table names make the cache key and the physical object
    # agree: A after B must equal A, and A must differ from B.
    import __spark_entry__ as e

    a_dir, b_dir = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    for name in ("bucketed_join", "bucketed_priority_census",
                 "bucket_pruned_lookup"):
        fn = e.queries()[name]
        a1 = fn(spark, a_dir).collect()
        b = fn(spark, b_dir).collect()
        a2 = fn(spark, a_dir).collect()
        assert a1 == a2
        assert a1 != b
