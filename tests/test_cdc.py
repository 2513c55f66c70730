"""CDC compaction operators (operators/cdc.py): latest_snapshot and
scd2_intervals — value semantics on crafted logs plus the plan
properties the 100 TB story depends on (partial-aggregate snapshot, a
single Exchange for the two-window history build)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.operators.cdc import (
    latest_snapshot, scd2_intervals,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


LOG = [
    # (event_id, ts, key, state)
    (1, 10, "a", "new"),
    (2, 20, "a", "active"),
    (3, 30, "a", "active"),   # no change — collapsed in SCD2
    (4, 40, "a", "churned"),
    (5, 10, "b", "new"),
    (6, 10, "b", "active"),   # same ts as 5: event_id breaks the tie
    (7, 50, "c", None),       # NULL state tracked null-safely
    (8, 60, "c", None),
]


def _log(spark):
    return spark.createDataFrame(
        LOG, "event_id long, ts long, key string, state string")


def test_latest_snapshot_values(spark):
    got = {r["key"]: (r["ts"], r["event_id"], r["state"])
           for r in latest_snapshot(_log(spark), "key", "ts",
                                    tiebreak="event_id").collect()}
    assert got == {"a": (40, 4, "churned"),
                   "b": (10, 6, "active"),   # tie on ts=10 → event_id 6
                   "c": (60, 8, None)}


def test_latest_snapshot_is_partial_aggregate_not_window(spark):
    plan = _plan(latest_snapshot(_log(spark), "key", "ts", tiebreak="event_id"))
    assert "Window" not in plan
    # map-side combine: a partial_max appears below the exchange
    assert "partial_max" in plan or "partial" in plan.lower()


def test_scd2_intervals_values(spark):
    rows = scd2_intervals(_log(spark), "key", "ts", attrs=["state"],
                          tiebreak="event_id").collect()
    got = sorted((r["key"], r["state"], r["valid_from"], r["valid_to"],
                  r["is_current"]) for r in rows)
    assert got == [
        ("a", "active", 20, 40, False),    # 30 collapsed into [20, 40)
        ("a", "churned", 40, None, True),
        ("a", "new", 10, 20, False),
        ("b", "active", 10, None, True),   # change within one timestamp
        ("b", "new", 10, 10, False),
        ("c", None, 50, None, True),       # NULL==NULL collapses row 8
    ]


def test_scd2_single_exchange(spark):
    plan = _plan(scd2_intervals(_log(spark), "key", "ts", attrs=["state"],
                                tiebreak="event_id"))
    assert plan.count("Exchange") == 1, plan


def test_scd2_multi_attr_change_detection(spark):
    df = spark.createDataFrame(
        [(1, 1, "k", "x", 1.0), (2, 2, "k", "x", 2.0), (3, 3, "k", "x", 2.0)],
        "event_id long, ts long, key string, a string, b double")
    rows = scd2_intervals(df, "key", "ts", attrs=["a", "b"],
                          tiebreak="event_id").collect()
    # b changes at ts=2; ts=3 identical → collapsed
    assert [(r["valid_from"], r["valid_to"]) for r in
            sorted(rows, key=lambda r: r["valid_from"])] == [(1, 2), (2, None)]


def test_merge_upsert_round_trips(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.operators.cdc import merge_upsert
    target = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, 10, "a", "x"), (2, 10, "b", "y")],
        "event_id long, ts long, key string, val string")
    stats = merge_upsert(spark, target, v1, key="key", ts="ts",
                         tiebreak="event_id")
    assert stats == {"rows": 2, "keys_deleted": 0}
    # upsert: newer version of 'a', brand-new 'c', stale update of 'b'
    v2 = spark.createDataFrame(
        [(3, 20, "a", "x2"), (4, 20, "c", "z"), (5, 5, "b", "stale")],
        "event_id long, ts long, key string, val string")
    merge_upsert(spark, target, v2, key="key", ts="ts", tiebreak="event_id")
    got = {r["key"]: r["val"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": "x2", "b": "y", "c": "z"}  # stale update lost


def test_merge_upsert_tombstone_delete(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.operators.cdc import merge_upsert
    target = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, 10, "a", "x"), (2, 10, "b", "y")],
        "event_id long, ts long, key string, val string")
    merge_upsert(spark, target, v1, key="key", ts="ts",
                 tiebreak="event_id", delete_col="_deleted")
    v2 = spark.createDataFrame(
        [(3, 20, "a", "x", True)],
        "event_id long, ts long, key string, val string, _deleted boolean")
    stats = merge_upsert(spark, target, v2, key="key", ts="ts",
                         tiebreak="event_id", delete_col="_deleted")
    assert stats["keys_deleted"] == 1 and stats["rows"] == 1
    # default mode retains the tombstone row (durable delete); live
    # rows come through read_merged
    from etl_excel_to_hyper_tableau_spark.operators.cdc import read_merged
    live = read_merged(spark, target, delete_col="_deleted")
    assert {r["key"] for r in live.collect()} == {"b"}
    assert "_deleted" not in live.columns
    assert "_deleted" in spark.read.parquet(target).columns
    # durability: a straggler batch with an OLDER ts for the deleted
    # key must NOT resurrect it — the retained tombstone (ts=20) wins
    v3 = spark.createDataFrame(
        [(4, 15, "a", "stale")],
        "event_id long, ts long, key string, val string")
    merge_upsert(spark, target, v3, key="key", ts="ts",
                 tiebreak="event_id", delete_col="_deleted")
    live = read_merged(spark, target, delete_col="_deleted")
    assert {r["key"] for r in live.collect()} == {"b"}


def test_merge_upsert_drop_tombstones_mode(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.operators.cdc import merge_upsert
    target = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, 10, "a", "x"), (2, 10, "b", "y")],
        "event_id long, ts long, key string, val string")
    merge_upsert(spark, target, v1, key="key", ts="ts",
                 tiebreak="event_id", delete_col="_deleted",
                 retain_tombstones=False)
    v2 = spark.createDataFrame(
        [(3, 20, "a", "x", True)],
        "event_id long, ts long, key string, val string, _deleted boolean")
    stats = merge_upsert(spark, target, v2, key="key", ts="ts",
                         tiebreak="event_id", delete_col="_deleted",
                         retain_tombstones=False)
    assert stats["keys_deleted"] == 1 and stats["rows"] == 1
    rows = spark.read.parquet(target).collect()
    assert {r["key"] for r in rows} == {"b"}
    assert "_deleted" not in spark.read.parquet(target).columns


def test_merge_upsert_null_tombstone_is_not_a_delete(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.operators.cdc import merge_upsert
    target = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, 10, "a", "x", None), (2, 10, "b", "y", None)],
        "event_id long, ts long, key string, val string, _deleted boolean")
    stats = merge_upsert(spark, target, v1, key="key", ts="ts",
                         tiebreak="event_id", delete_col="_deleted")
    assert stats == {"rows": 2, "keys_deleted": 0}
    assert {r["key"] for r in spark.read.parquet(target).collect()} == {"a", "b"}


def test_merge_upsert_recovers_interrupted_swap(spark, tmp_path):
    import os
    from etl_excel_to_hyper_tableau_spark.operators.cdc import merge_upsert
    target = str(tmp_path / "tbl")
    v1 = spark.createDataFrame([(1, 10, "a", "x")],
                               "event_id long, ts long, key string, val string")
    merge_upsert(spark, target, v1, key="key", ts="ts", tiebreak="event_id")
    # simulate a crash between the two renames: target gone, old present
    os.rename(target, target + "__merge_old")
    v2 = spark.createDataFrame([(2, 20, "b", "y")],
                               "event_id long, ts long, key string, val string")
    merge_upsert(spark, target, v2, key="key", ts="ts", tiebreak="event_id")
    got = {r["key"] for r in spark.read.parquet(target).collect()}
    assert got == {"a", "b"}  # the rolled-back table was not lost


def test_latest_snapshot_map_payload(spark):
    from etl_excel_to_hyper_tableau_spark.operators.cdc import latest_snapshot
    df = spark.createDataFrame(
        [(1, 10, "k", {"a": "1"}), (2, 20, "k", {"b": "2"})],
        "event_id long, ts long, key string, props map<string,string>")
    rows = latest_snapshot(df, "key", "ts", tiebreak="event_id").collect()
    assert len(rows) == 1 and rows[0]["props"] == {"b": "2"}


def test_point_in_time_lookup_never_leaks_future(spark):
    import datetime
    from etl_excel_to_hyper_tableau_spark.operators.cdc import (
        point_in_time_lookup,
    )
    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    changes = spark.createDataFrame(
        [(1, t(0), 100, "bronze"),
         (1, t(10), 101, "silver"),
         (1, t(20), 102, "gold"),
         (2, t(5), 103, "bronze")],
        "user_id long, ts timestamp, event_id long, tier string")
    events = spark.createDataFrame(
        [(900, 1, t(4)),    # between v0 and v1 -> bronze
         (901, 1, t(10)),   # exactly at v1 -> silver (inclusive)
         (902, 1, t(55)),   # after last change -> gold
         (903, 2, t(4)),    # before user 2's first version -> dropped
         (904, 2, t(6))],   # -> bronze
        "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r for r in point_in_time_lookup(
        events, changes, "user_id", "ts", "ts", ["tier"],
        tiebreak="event_id").collect()}
    assert out[900]["v_tier"] == "bronze"
    assert out[901]["v_tier"] == "silver"
    assert out[902]["v_tier"] == "gold"
    assert out[904]["v_tier"] == "bronze"
    assert 903 not in out  # no version existed yet -> inner semantics


def test_point_in_time_lookup_same_instant_last_wins(spark):
    import datetime
    from etl_excel_to_hyper_tableau_spark.operators.cdc import (
        point_in_time_lookup,
    )
    t0 = datetime.datetime(2024, 1, 1)
    changes = spark.createDataFrame(
        [(1, t0, 10, "a"), (1, t0, 11, "b")],  # same instant; 11 later
        "user_id long, ts timestamp, event_id long, st string")
    events = spark.createDataFrame([(900, 1, t0)],
                                   "event_id long, user_id long, ts timestamp")
    out = point_in_time_lookup(events, changes, "user_id", "ts", "ts",
                               ["st"], tiebreak="event_id").collect()
    assert len(out) == 1 and out[0]["v_st"] == "b"


def test_merge_retain_tombstones_counts_only_this_batch(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.operators.cdc import merge_upsert
    d = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("a", 1, 1.0, False), ("b", 1, 2.0, False)],
        "k string, ts long, v double, dead boolean")
    s1 = merge_upsert(spark, d, b1, "k", "ts", delete_col="dead",
                      retain_tombstones=True)
    assert s1["keys_deleted"] == 0
    # batch 2 deletes 'a'
    b2 = spark.createDataFrame([("a", 2, 0.0, True)],
                               "k string, ts long, v double, dead boolean")
    s2 = merge_upsert(spark, d, b2, "k", "ts", delete_col="dead",
                      retain_tombstones=True)
    assert s2["keys_deleted"] == 1
    # batch 3 touches only 'c' — the retained tombstone for 'a' must
    # NOT be re-reported as a delete of this merge
    b3 = spark.createDataFrame([("c", 3, 5.0, False)],
                               "k string, ts long, v double, dead boolean")
    s3 = merge_upsert(spark, d, b3, "k", "ts", delete_col="dead",
                      retain_tombstones=True)
    assert s3["keys_deleted"] == 0
    assert s3["rows"] == 2  # live rows: b, c


def test_merge_retained_tombstone_blocks_out_of_order_resurrection(
        spark, tmp_path):
    """The durable-delete contract: delete key k at ts=20, then merge a
    straggler batch carrying an OLDER-ts (ts=15) version of k — the
    retained tombstone wins latest-version-per-key and k stays gone."""
    from etl_excel_to_hyper_tableau_spark.operators.cdc import (
        merge_upsert, read_merged,
    )
    d = str(tmp_path / "t_oo")
    b1 = spark.createDataFrame([("k", 10, 1.0, False), ("x", 10, 9.0, False)],
                               "k string, ts long, v double, dead boolean")
    merge_upsert(spark, d, b1, "k", "ts", delete_col="dead")
    b2 = spark.createDataFrame([("k", 20, 0.0, True)],
                               "k string, ts long, v double, dead boolean")
    s2 = merge_upsert(spark, d, b2, "k", "ts", delete_col="dead")
    assert s2["keys_deleted"] == 1
    # straggler: an older version of the deleted key arrives late
    b3 = spark.createDataFrame([("k", 15, 2.0, False)],
                               "k string, ts long, v double, dead boolean")
    s3 = merge_upsert(spark, d, b3, "k", "ts", delete_col="dead")
    assert s3["keys_deleted"] == 0
    live = {r["k"] for r in read_merged(spark, d, delete_col="dead").collect()}
    assert live == {"x"}  # k stayed dead
    # and the tombstone itself is still on disk for the NEXT straggler
    raw = spark.read.parquet(d).filter("dead").collect()
    assert [r["k"] for r in raw] == ["k"]
