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
