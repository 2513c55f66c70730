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
    qs = [row["price_p50"], row["price_p95"], row["price_p99"]]
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


def test_count_min_matches_python_model_and_bounds(spark):
    import hashlib
    from collections import Counter
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        count_min_build, count_min_estimate,
    )
    depth, width = 3, 64
    keys = [i % 17 for i in range(500)] + [3] * 100  # key 3 is hot
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    sketch = count_min_build(df, "k", depth=depth, width=width)
    probes = spark.createDataFrame([(k,) for k in range(17)], "k long")
    got = {r["key"]: r["est"]
           for r in count_min_estimate(sketch, probes, "k",
                                       depth=depth, width=width).collect()}

    def bucket(d, k):
        h = hashlib.md5(f"{d}:{k}".encode()).hexdigest()
        return int(h[:15], 16) % width

    true = Counter(keys)
    cells = Counter()
    for k, c in true.items():
        for d in range(depth):
            cells[(d, bucket(d, k))] += c
    for k in range(17):
        model = min(cells[(d, bucket(d, k))] for d in range(depth))
        assert got[str(k)] == model          # bit-exact vs the model
        assert got[str(k)] >= true[k]        # CMS never under-counts
    assert got["3"] >= 100


def test_count_min_sketches_merge_cellwise(spark):
    from pyspark.sql import functions as F
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        count_min_build, count_min_estimate,
    )
    a = spark.createDataFrame([(1,)] * 6 + [(2,)] * 2, "k long")
    b = spark.createDataFrame([(1,)] * 4 + [(3,)] * 5, "k long")
    merged = (count_min_build(a, "k", depth=2, width=32)
              .unionByName(count_min_build(b, "k", depth=2, width=32))
              .groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt")))
    whole = count_min_build(a.unionByName(b), "k", depth=2, width=32)
    probes = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    em = {r["key"]: r["est"] for r in count_min_estimate(
        merged, probes, "k", depth=2, width=32).collect()}
    ew = {r["key"]: r["est"] for r in count_min_estimate(
        whole, probes, "k", depth=2, width=32).collect()}
    assert em == ew  # merged sketches == sketch of the union
    assert em["1"] >= 10 and em["3"] >= 5


def test_hll_estimate_within_error_bound(spark):
    """Standard error of HLL at m=256 is ~1.04/sqrt(256) = 6.5%; assert
    a loose 3-sigma envelope on a 20k-distinct stream with repeats."""
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        hll_build, hll_estimate,
    )
    df = spark.range(60_000).select((F.col("id") % 20_000).alias("k"))
    est = hll_estimate(hll_build(df, "k", p=8), p=8).collect()[0]
    assert abs(est["estimate"] - 20_000) <= 0.20 * 20_000
    assert est["n_registers_hit"] == 256 and est["v_zero"] == 0


def test_hll_small_range_correction_is_near_exact(spark):
    """Tiny cardinalities take the linear-counting branch, which is
    near-exact while most registers are empty."""
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        hll_build, hll_estimate,
    )
    df = spark.range(30).select(F.col("id").alias("k"))
    est = hll_estimate(hll_build(df, "k", p=8), p=8).collect()[0]
    assert est["v_zero"] > 0
    assert abs(est["estimate"] - 30) <= 4


def test_hll_sketches_merge_by_union_max(spark):
    """The HLL property: sketches over disjoint halves, merged by
    UNION + max per register, equal the whole-stream sketch exactly."""
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        hll_build, hll_estimate,
    )
    whole = spark.range(5_000).select(F.col("id").alias("k"))
    a = whole.filter("k < 2500")
    b = whole.filter("k >= 2500")
    merged = (hll_build(a, "k").unionByName(hll_build(b, "k"))
              .groupBy("register").agg(F.max("max_rank").alias("max_rank")))
    e_m = hll_estimate(merged).collect()[0]
    e_w = hll_estimate(hll_build(whole, "k")).collect()[0]
    assert e_m == e_w


def test_hll_build_is_register_bounded(spark):
    from etl_excel_to_hyper_tableau_spark.operators.sketches import (
        hll_build,
    )
    df = spark.range(100_000).select(F.col("id").alias("k"))
    sk = hll_build(df, "k", p=6).collect()
    assert len(sk) <= 64
    assert all(1 <= r["max_rank"] <= 55 for r in sk)
