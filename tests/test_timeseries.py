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


# ---------------------------------------------------------------------------
# weekly cohort retention
# ---------------------------------------------------------------------------

def test_cohort_retention_offsets(spark):
    import datetime as dt

    from etl_excel_to_hyper_tableau_spark.streaming.events import cohort_retention

    d = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    rows = [  # user 1: weeks 0 and 2; user 2: week 0 only (same cohort);
              # user 3: later cohort, weeks 0 and 1
        (1, d("2024-01-01T10:00:00")), (1, d("2024-01-03T10:00:00")),
        (1, d("2024-01-15T10:00:00")),
        (2, d("2024-01-02T09:00:00")),
        (3, d("2024-01-08T12:00:00")), (3, d("2024-01-14T23:00:00")),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(r["cohort_week"].date().isoformat(), r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    assert out[("2024-01-01", 0)] == 2   # users 1 and 2 active in cohort week
    assert out[("2024-01-01", 2)] == 1   # user 1 returns two weeks later
    assert out[("2024-01-08", 0)] == 1   # user 3's cohort (Jan 8 = Monday)
    assert ("2024-01-08", 1) not in out  # Jan 14 is the SAME ISO week
    assert sum(n for (_, off), n in out.items() if off == 0) == 3
