"""Time-series regularization: resample an irregular per-key series
onto a fixed grid with forward-fill.

The classic feature-prep step (sensor/event data rarely arrives on a
grid; models want one).  Spark has no RESAMPLE primitive; the naive
formulation — per grid point, "latest observation at or before" — is a
theta join.  This is the linear rewrite, the same shape as
:func:`.interval.asof_join`: union grid markers with observations and
run ONE window pass per key ordered by (ts, side) carrying
``last(value, ignorenulls)`` forward.  Cost: one partial-aggregate
shuffle for per-key bounds + one window shuffle on the key — both
corpus-linear, no per-grid-point probing, grid density controlled by
``step``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_ffill(df: DataFrame, key: str, ts: str, value: str,
                   step: str = "1 hour",
                   tiebreak: str | None = None) -> DataFrame:
    """Per ``key``: an evenly spaced grid from ``date_trunc`` of the
    key's first observation to its last, each grid point carrying the
    most recent observation's ``value`` at or before it (NULL before
    the first observation — a leading grid point has nothing to fill
    from).

    Ties (several observations at one timestamp) resolve to the
    greatest ``tiebreak``; pass one whenever timestamps can collide or
    the filled value is engine/partitioning-dependent.

    Output: ``key, grid_ts, value`` (value column keeps its name).
    """
    unit = step.split()[-1].rstrip("s")  # "1 hour" → truncation unit
    obs = df.select(F.col(key).alias("k"), F.col(ts).alias("t"),
                    F.col(value).alias("v"),
                    *( [F.col(tiebreak).alias("tb")] if tiebreak else []))
    if tiebreak:  # one observation per (key, ts): greatest tiebreak wins
        obs = (obs.groupBy("k", "t")
               .agg(F.max_by(F.col("v"), F.col("tb")).alias("v")))
    bounds = obs.groupBy("k").agg(
        F.date_trunc(unit, F.min("t")).alias("lo"), F.max("t").alias("hi"))
    grid = bounds.select(
        "k", F.explode(F.sequence("lo", "hi",
                                  F.expr(f"INTERVAL {step}"))).alias("t"))
    g = grid.select("k", "t", F.lit(None).cast(obs.schema["v"].dataType).alias("v"),
                    F.lit(1).alias("side"))
    o = obs.select("k", "t", "v", F.lit(0).alias("side"))
    w = (Window.partitionBy("k").orderBy(F.col("t").asc(), F.col("side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (g.unionByName(o)
            .withColumn("__f__", F.last("v", ignorenulls=True).over(w))
            .filter(F.col("side") == 1)
            .select(F.col("k").alias(key), F.col("t").alias("grid_ts"),
                    F.col("__f__").alias(value)))
