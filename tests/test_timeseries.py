"""resample_ffill (operators/timeseries.py): grid construction,
forward-fill, leading NULLs, tie resolution, linear plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.operators.timeseries import resample_ffill


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_resample_grid_and_ffill(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0, 30), 10.0),   # 00:30 → first grid point 00:00 is NULL
         (2, 1, _ts(2, 15), 20.0),
         (3, 2, _ts(1, 0), 5.0)],
        "event_id long, k long, t timestamp, v double")
    out = resample_ffill(df, "k", "t", "v", step="1 hour",
                         tiebreak="event_id")
    got = {(r["k"], r["grid_ts"].hour): r["v"] for r in out.collect()}
    # key 1: grid 00..02 (trunc of 00:30 → 00:00; max obs 02:15 → last grid 02:00)
    assert got[(1, 0)] is None          # before first observation
    assert got[(1, 1)] == 10.0          # filled forward from 00:30
    assert got[(1, 2)] == 10.0          # 02:00 precedes the 02:15 obs
    assert got[(2, 1)] == 5.0 and len([k for k in got if k[0] == 2]) == 1


def test_resample_tie_takes_greatest_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0, 0), 1.0), (2, 1, _ts(0, 0), 2.0)],
        "event_id long, k long, t timestamp, v double")
    out = resample_ffill(df, "k", "t", "v", tiebreak="event_id").collect()
    assert len(out) == 1 and out[0]["v"] == 2.0


def test_resample_plan_no_theta_join(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0), 1.0)], "event_id long, k long, t timestamp, v double")
    plan = (resample_ffill(df, "k", "t", "v", tiebreak="event_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
