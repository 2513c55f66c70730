"""Data-quality expectations (operators/quality.py): one-pass report,
NULL-as-violation semantics, uniqueness checks, name escaping, and the
single-Exchange plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.operators.quality import check_report


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, -3.0, "B"), (3, None, "A"), (1, 5.0, None)],
        "id long, v double, cat string")


def test_report_values_and_null_semantics(spark):
    got = {r["check"]: (r["n_violations"], r["passed"])
           for r in check_report(
               _df(spark),
               {"v_positive": F.col("v") > 0,          # NULL v → violation
                "cat_domain": F.col("cat").isin("A", "B")},
               unique=["id"]).collect()}
    assert got == {"v_positive": (2, False),   # -3.0 and NULL
                   "cat_domain": (1, False),   # NULL cat
                   "unique(id)": (1, False)}   # id=1 twice


def test_all_passing_and_quote_escape(spark):
    rows = check_report(_df(spark),
                        {"id's positive": F.col("id") > 0}).collect()
    assert rows[0]["check"] == "id's positive"
    assert rows[0]["passed"] and rows[0]["n_violations"] == 0
    assert rows[0]["n_rows"] == 4


def test_single_pass_plan(spark):
    plan = (check_report(_df(spark),
                         {"a": F.col("id") > 0, "b": F.col("v") > 0})
            ._jdf.queryExecution().executedPlan().toString())
    # all checks share one aggregate: exactly one Exchange (to the
    # single final-agg partition), no join, no second scan
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_no_checks_raises(spark):
    with pytest.raises(ValueError):
        check_report(_df(spark), {})


def test_empty_frame_reports_zero_violations(spark):
    df = spark.createDataFrame([], "id long, v double")
    rows = check_report(df, {"v_pos": F.col("v") > 0}, unique=["id"]).collect()
    for r in rows:
        assert r["n_violations"] == 0 and bool(r["passed"]) and r["n_rows"] == 0


def test_backslash_in_check_name_survives(spark):
    df = spark.createDataFrame([(1,)], "id long")
    rows = check_report(df, {r"re:\d+ match": F.col("id") > 0}).collect()
    assert rows[0]["check"] == r"re:\d+ match"


def test_json_field_profile_counts_and_quarantine(spark):
    """Presence/numeric/distinct per key; invalid JSON contributes
    nothing; values profile as strings (scalars arrive unquoted)."""
    from etl_excel_to_hyper_tableau_spark.operators.quality import (
        json_field_profile,
    )
    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "b": "x", "c": "7"}',),
        ('{"a": "notnum"}',),
        ("not json at all",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "j string")
    out = {r["key"]: r for r in json_field_profile(df, "j").collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"]["n_present"] == 3
    assert out["a"]["n_numeric"] == 2          # "notnum" fails try_cast
    assert out["a"]["n_distinct"] == 3
    assert out["b"]["n_present"] == 2 and out["b"]["n_distinct"] == 1
    assert out["c"]["n_numeric"] == 1          # "7" parses even quoted


def test_json_field_profile_approx_ndv_within_hll_error(spark):
    """approx_ndv=True swaps the exact per-key distinct for the
    portable grouped HLL; p=8 gives ~6.5% typical error — assert 15%
    on a few hundred distinct values, and that low-cardinality keys
    (linear-counting range) come out near-exact."""
    import json as _json

    from etl_excel_to_hyper_tableau_spark.operators.quality import (
        json_field_profile,
    )
    rows = [(_json.dumps({"uid": f"user{i}", "country": f"c{i % 7}"}),)
            for i in range(400)]
    df = spark.createDataFrame(rows, "j string")
    exact = {r["key"]: r for r in json_field_profile(df, "j").collect()}
    approx = {r["key"]: r for r in
              json_field_profile(df, "j", approx_ndv=True).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        assert approx[k]["n_present"] == exact[k]["n_present"]
        assert approx[k]["n_numeric"] == exact[k]["n_numeric"]
    assert abs(approx["uid"]["n_distinct"] - 400) / 400 < 0.15
    assert abs(approx["country"]["n_distinct"] - 7) < 1.0
