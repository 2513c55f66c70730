"""Temporal / interval join operators Spark SQL lacks as primitives.

The reference delegates all querying to SQLite (query_iterator.py:131),
which has no as-of or range join either — these are engine extensions
for the time-series / training-data workloads this rebuild targets,
expressed as compositions of existing DataFrame ops (SURVEY §7 M7
stance: no custom Catalyst work).

* :func:`asof_join` — "most recent right row at or before each left
  row, per key".  The naive formulation is a theta join (``l.ts >=
  r.ts`` + argmax), quadratic per key.  This one is the standard
  distributed rewrite: union both sides, one window pass ordered by
  (ts, side) carrying the right payload forward with
  ``last(ignorenulls)`` — a single shuffle on the key, linear work,
  no theta join anywhere in the plan.

* :func:`range_join_binned` — equi-accelerated interval join for
  ``point BETWEEN lo AND hi`` predicates.  Naively this is a
  BroadcastNestedLoop/cartesian; binning rewrites it as an equi-join
  on ``floor(point / bin)`` after exploding each interval into the
  bins it covers, so Spark runs a hash/sort-merge join and the
  per-row comparison count drops from |ranges| to the ranges
  overlapping one bin.  Correct for arbitrary (including overlapping)
  intervals; bin width trades replication of long intervals against
  join fan-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              ts: str, direction: str = "backward",
              right_prefix: str = "r_") -> DataFrame:
    """For each left row: the right row with the greatest ``ts`` that is
    ``<=`` the left row's ``ts`` (``direction='backward'``; ``'forward'``
    symmetrically takes the least ``ts >=``), matched within ``key``.

    Inner semantics: left rows with no qualifying right row are dropped.
    Right payload columns appear as ``{right_prefix}{col}``; the matched
    right timestamp as ``{right_prefix}{ts}``.  At equal timestamps the
    right row is visible to the left row (``>=`` / ``<=``, as in DuckDB's
    ASOF JOIN).  Right should be unique per (key, ts); if not, which of
    the tied rows wins is unspecified (same as SQL ASOF).

    One shuffle (the window partition on ``key``), no theta join: scales
    to any number of rows per key that fits a partition's sort spill.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    l_cols = left.columns
    r_payload = [c for c in right.columns if c not in (key, ts)]
    out_r = [f"{right_prefix}{ts}"] + [f"{right_prefix}{c}" for c in r_payload]

    # side ordering makes right rows at a tied timestamp sort before the
    # left rows that may match them (backward; after, for forward)
    l_tagged = left.select(
        F.col(key).alias("__k__"), F.col(ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        *[F.col(c).alias(f"__l_{c}__") for c in l_cols],
        *[F.lit(None).alias(f"__r_{c}__") for c in [ts] + r_payload])
    r_tagged = right.select(
        F.col(key).alias("__k__"), F.col(ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}__") for c in l_cols],
        F.col(ts).alias(f"__r_{ts}__"),
        *[F.col(c).alias(f"__r_{c}__") for c in r_payload])
    unioned = l_tagged.unionByName(r_tagged)

    order = [F.col("__ts__").asc(), F.col("__side__").asc()] \
        if direction == "backward" else [F.col("__ts__").desc(), F.col("__side__").asc()]
    w = (Window.partitionBy("__k__").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.select(
        "*", *[F.last(f"__r_{c}__", ignorenulls=True).over(w).alias(f"__c_{c}__")
               for c in [ts] + r_payload])
    return (carried.filter((F.col("__side__") == 1)
                           & F.col(f"__c_{ts}__").isNotNull())
            .select(*[F.col(f"__l_{c}__").alias(c) for c in l_cols],
                    *[F.col(f"__c_{c}__").alias(o)
                      for c, o in zip([ts] + r_payload, out_r)]))


def range_join_binned(points: DataFrame, ranges: DataFrame,
                      point_col: str, lo_col: str, hi_col: str,
                      bin_width: float) -> DataFrame:
    """Join each point row to every range row with
    ``lo <= point <= hi`` (bounds inclusive; overlapping ranges all
    match) via bin equi-join instead of a nested-loop theta join.

    Each range explodes into ``ceil((hi-lo)/bin_width)+1`` bin copies —
    pick ``bin_width`` near the typical range length so replication
    stays O(1) per range while each bin join bucket holds only the
    ranges overlapping it.  Output: all point columns + all range
    columns.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    b = F.lit(bin_width)
    p_binned = points.withColumn("__bin__",
                                 F.floor(F.col(point_col) / b).cast("long"))
    r_binned = ranges.withColumn(
        "__bin__",
        F.explode(F.sequence(F.floor(F.col(lo_col) / b).cast("long"),
                             F.floor(F.col(hi_col) / b).cast("long"))))
    return (p_binned.join(r_binned, "__bin__")
            .filter((F.col(point_col) >= F.col(lo_col))
                    & (F.col(point_col) <= F.col(hi_col)))
            .drop("__bin__"))
