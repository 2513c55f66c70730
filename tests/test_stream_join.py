"""Stream-stream join: the availableNow streaming execution over a
bounded source must equal the batch join (same predicate, same rows) —
the duality that validates the watermark/state-store configuration."""

from __future__ import annotations

from etl_excel_to_hyper_tableau_spark.streaming import (
    purchase_click_join_batch, run_purchase_click_join_availablenow,
)


def test_stream_equals_batch(spark, sf_dir):
    import __spark_entry__ as entry
    events = entry._events(spark, sf_dir)
    batch = purchase_click_join_batch(events, lookback_minutes=60)
    stream = run_purchase_click_join_availablenow(
        spark, f"{sf_dir}/events.parquet", lookback_minutes=60)
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, stream.collect()))
    assert len(b) > 0          # the join is non-trivial on the testdata
    assert s == b


def test_lookback_bounds_matches(spark, sf_dir):
    import __spark_entry__ as entry
    events = entry._events(spark, sf_dir)
    narrow = purchase_click_join_batch(events, lookback_minutes=5).count()
    wide = purchase_click_join_batch(events, lookback_minutes=120).count()
    assert narrow < wide       # a tighter window strictly drops matches


def test_event_transitions_markov_counts(spark):
    import datetime
    from etl_excel_to_hyper_tableau_spark.streaming.events import event_transitions
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: view -> click -> buy ; user 2: view -> click -> click
    for i, (u, seq) in enumerate([(1, ["view", "click", "buy"]),
                                  (2, ["view", "click", "click"])]):
        for j, et in enumerate(seq):
            rows.append((i * 10 + j, t0 + datetime.timedelta(minutes=j), u, et))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "user_id long, event_type string")
    out = {(r["prev_type"], r["next_type"]): r
           for r in event_transitions(df, topk=3).collect()}
    assert out[("view", "click")]["cnt"] == 2
    assert out[("view", "click")]["p"] == 1.0
    assert out[("click", "buy")]["cnt"] == 1
    assert out[("click", "buy")]["prev_total"] == 2
    assert out[("click", "click")]["p"] == 0.5
    # cross-user boundaries contribute no transition
    assert ("buy", "view") not in out
