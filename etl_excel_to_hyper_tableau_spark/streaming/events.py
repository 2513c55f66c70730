"""Structured Streaming operators over the ``events`` table shape
(event_id, ts, user_id, event_type, value, props).

The reference is pure batch (SURVEY §2C last row); streaming is the
scale-era extension: the same event analytics expressed as an unbounded
query with watermarks for late data.  The batch/stream duality is
deliberate — :func:`sessionize_batch` and the streaming window counts
share semantics with their batch oracles, which is how correctness is
checked (run the stream with ``availableNow`` over a static directory,
compare to the batch answer).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def windowed_counts_stream(spark: SparkSession, events_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Unbounded tumbling-window counts per event_type with a watermark
    for late data.  Returns the *streaming* DataFrame (caller attaches a
    sink); schema: window struct, event_type, n, total_value."""
    # events testdata stores TIMESTAMP(NANOS): read nanos as long and
    # truncate to micros (matches DuckDB's floor) before watermarking
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    # the file source streams a *directory*; accept a single-file path by
    # splitting it into (parent, glob)
    reader = spark.readStream.schema(schema)
    if events_dir.endswith(".parquet"):
        parent, _, fname = events_dir.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        events_dir = parent
    stream = reader.parquet(events_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    stream = stream.withWatermark("ts", watermark)
    return (stream
            .groupBy(F.window("ts", window).alias("window"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value")))


def run_windowed_counts_availablenow(spark: SparkSession, events_dir: str,
                                     window: str = "1 hour") -> DataFrame:
    """Execute the stream over the static directory with the
    ``availableNow`` trigger (process-everything-then-stop) into an
    in-memory sink; returns the batch result table.

    This is a real Structured Streaming execution — micro-batches,
    state store, watermark bookkeeping — not a batch rewrite.
    """
    name = "ev_counts_" + uuid.uuid4().hex[:8]
    q = (windowed_counts_stream(spark, events_dir, window=window)
         .writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window.start").alias("window_start"),
        "event_type", "n",
        F.col("total_value").cast("double").alias("total_value"))


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a new session starts when a user's gap from
    the previous event exceeds ``gap_minutes``.  Classic lag + running
    sum; one shuffle on user_id.  Output per session:
    ``user_id, session_id, n_events, session_start, session_end``.
    """
    by_user = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sess = (events
                 .withColumn("__new__", is_new)
                 .withColumn("session_id",
                             F.sum("__new__").over(
                                 by_user.rowsBetween(Window.unboundedPreceding, 0))))
    return (with_sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))
