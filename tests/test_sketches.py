"""Approximate-sketch profiling (`sketch_profile`): the estimates are
engine-specific (hence rows-only in the driver oracle), so correctness
here means *bounded relative error vs the exact answers* plus the
plan property that makes sketches the scale tool: fixed-size partial
aggregation, no shuffle of raw values."""

from __future__ import annotations

import __spark_entry__ as entry
from pyspark.sql import functions as F


def test_sketch_estimates_within_error_bounds(spark, sf_dir):
    row = entry.q_sketch_profile(spark, sf_dir).collect()[0]
    li = entry._t(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
        F.count("*").alias("n")).collect()[0]
    # HLL++ default rsd = 5%; assert a loose 10% envelope
    for got, want in [(row["ndv_orders"], exact["o"]),
                      (row["ndv_parts"], exact["p"]),
                      (row["ndv_suppliers"], exact["s"])]:
        assert abs(got - want) <= max(0.10 * want, 2), (got, want)
    assert row["n_rows"] == exact["n"]
    # quantile sketch (accuracy 10000 → ~0.01% rank error): compare
    # against exact percentile_cont-style quantiles within 1% of value
    qs = row["price_quantiles"]
    assert qs[0] < qs[1] < qs[2]
    exact_q = li.selectExpr(
        "percentile(l_extendedprice, array(0.5, 0.95, 0.99)) as q").collect()[0]["q"]
    for got, want in zip(qs, exact_q):
        assert abs(got - want) <= 0.01 * want, (got, want)


def test_sketch_plan_is_partial_aggregate(spark, sf_dir):
    plan = (entry.q_sketch_profile(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    # partial sketch state reduces map-side; one exchange to merge
    assert "partial" in plan.lower()
    assert plan.count("Exchange") == 1, plan
