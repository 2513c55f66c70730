"""Event-time normalization for the ``events`` table shape.

Testdata generations have stored ``ts`` three ways: TIMESTAMP(NANOS)
(Spark's reader rejects it — read nanos as long via
``spark.sql.legacy.parquet.nanosAsLong`` and floor to micros, identical
to DuckDB's nanos→micros truncation), native TIMESTAMP_NTZ
(isAdjustedToUTC=false micros), and plain TIMESTAMP.  Everything
downstream (watermarks, session_window, epoch math) needs TIMESTAMP
(LTZ): Structured Streaming refuses NTZ event-time columns
(EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and NTZ cannot cast to BIGINT.
With the session timezone pinned to UTC (session.py) the NTZ→LTZ cast
is instant-preserving and matches DuckDB's naive-as-UTC semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce an event-time column to TIMESTAMP (LTZ) regardless of how
    the parquet stored it.  Map-only; no shuffle."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":  # nanos read as long → floor to micros
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dt == "timestamp_ntz":  # wall-clock == UTC instant (session tz)
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df
