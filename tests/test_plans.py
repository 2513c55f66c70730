"""Plan-property regression tests: the perf-critical physical-plan
facts (filter pushdown to parquet, broadcast of dims, no row-wise
Python UDFs anywhere) pinned so a refactor can't silently lose them."""

import contextlib
import io

import pytest

import __spark_entry__ as entry


def _plan(spark, sf_dir, name: str) -> str:
    df = entry.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # ReadSchema must not contain columns the query never touches
    assert "l_comment" not in plan and "l_shipmode" not in plan


def test_dims_broadcast_in_join_queries(spark, sf_dir):
    plan = _plan(spark, sf_dir, "local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3   # nation/region/supplier
    assert "CartesianProduct" not in plan


def test_partial_aggregation_present(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # partial + final hash aggregate pair (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "shipping_priority")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", sorted(set(entry.queries()) - {"stream_event_counts"}))
def test_no_rowwise_python_udf_anywhere(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"


def test_round4_plan_shapes(spark, sf_dir):
    """Pin the round-4 operators' scale claims to their physical plans:
    map-only ops compile without a shuffle Exchange, single-shuffle ops
    carry exactly the claimed exchanges, top-k ops use
    TakeOrderedAndProject (never a global rank window)."""
    # epoch_upsample: map-only explode — zero shuffle exchanges
    p = _plan(spark, sf_dir, "epoch_upsample")
    assert "Exchange hashpartitioning" not in p \
        and "Exchange rangepartitioning" not in p
    # priority_sample: map-only scoring + global top-k
    p = _plan(spark, sf_dir, "priority_sample")
    assert "TakeOrderedAndProject" in p
    assert "Exchange hashpartitioning" not in p
    # vocab_drift: ONE data shuffle (the token groupBy) — the tagged
    # union must not add per-side exchanges; top-k is TakeOrdered
    p = _plan(spark, sf_dir, "vocab_drift")
    assert p.count("Exchange hashpartitioning") <= 2  # counts + tot agg
    assert "TakeOrderedAndProject" in p
    # corpus_diff: a single id-keyed exchange per side, no nested loops
    p = _plan(spark, sf_dir, "corpus_diff")
    assert "CartesianProduct" not in p \
        and "BroadcastNestedLoopJoin" not in p
    # dup_ngram_stats / token_fertility: partial+final aggregate pairs
    for name in ("dup_ngram_stats", "token_fertility"):
        p = _plan(spark, sf_dir, name)
        assert p.count("HashAggregate") >= 2, name
    # TPC-H Q7/Q8: every dim side broadcast, facts never nested-loop
    for name, n_bhj in (("volume_shipping", 3), ("market_share", 4)):
        p = _plan(spark, sf_dir, name)
        assert p.count("BroadcastHashJoin") >= n_bhj, name
        assert "CartesianProduct" not in p, name
