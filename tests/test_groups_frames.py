"""GROUPS-frame + EXCLUDE emulation (plans.groups_frames) on a
hand-checked frame; the full-size check against DuckDB's native EXCLUDE
implementation is the `groups_frame_window` oracle entry."""

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.plans.groups_frames import with_groups_frame


def test_groups_frame_and_exclude_hand_checked(spark):
    # partition 'a' ordered by k: groups {10}, {20, 20}, {40}; 'b': {30}
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "b", 30), (5, "a", 40)]
    df = spark.createDataFrame(rows, "id long, p string, k long")
    out = {r["id"]: r for r in
           with_groups_frame(df, ["p"], "k", "k", 1, 1).collect()}

    def vals(i):
        r = out[i]
        f = lambda x: None if x is None else float(x)
        return (r["grp"], f(r["s_frame"]), r["n_frame"],
                f(r["s_excl_current"]), f(r["s_excl_group"]),
                f(r["s_excl_ties"]))

    # id=1: frame = groups 1..2 = {10,20,20} → 50; excl cur 40; excl grp 40
    # (peer group = {10}); excl ties 50 (10 back in)
    assert vals(1) == (1, 50.0, 3, 40.0, 40.0, 50.0)
    # id=2/3: frame = all of 'a' = 90; excl cur 70; excl grp 50; ties 70
    assert vals(2) == (2, 90.0, 4, 70.0, 50.0, 70.0)
    assert vals(3) == (2, 90.0, 4, 70.0, 50.0, 70.0)
    # id=4: singleton partition — EXCLUDE CURRENT ROW / GROUP empty → NULL
    assert vals(4) == (1, 30.0, 1, None, None, 30.0)
    # id=5: frame = groups 2..3 = {20,20,40} → 80
    assert vals(5) == (3, 80.0, 3, 40.0, 40.0, 80.0)


def test_groups_frame_single_exchange(spark):
    """All three window passes share the partition key → exactly one
    Exchange in the plan (the scale property the rewrite promises)."""
    rows = [(i, "p" + str(i % 3), i % 7) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, p string, k long")
    plan = with_groups_frame(df, ["p"], "k", "k")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
