"""Z-order (Morton-curve) clustered layouts — the MULTI-column
data-skipping lever that completes the physical-layout set
(plans/bucketing.py: key co-location; plans/pruning.py: coarse
partition directories; this module: range clustering on 2+ columns at
once).

A table range-sorted on ONE column skips beautifully on that column
and not at all on any other.  Interleaving the bits of k normalized
columns into one Morton key and range-partitioning + sorting on it
gives every output file a small bounding box in ALL k dimensions, so
min/max statistics (parquet row-group stats here; file-level stats in
Delta/Iceberg manifests at 100 TB) prune scans filtered on ANY of the
interleaved columns.  This is exactly Delta Lake's ``OPTIMIZE ZORDER
BY`` / the classic UB-tree layout, built from Spark primitives:
``shiftleft``/bitwise-OR interleave (whole-stage codegen, no UDF) →
``repartitionByRange`` on the z-value → ``sortWithinPartitions``.

Honest scope note: open-source Spark's parquet source does NOT skip
whole FILES by min/max (that needs a table format with file stats);
the local win is parquet ROW-GROUP skipping inside each task plus
page-level pruning, and the per-file bounding boxes measured in
tests/test_zorder.py are the property Delta/Iceberg would use to skip
files outright.  The reference has no physical layout at all (SQLite
staging, query_iterator.py:101-107).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton key of pre-normalized non-negative ints (each already in
    ``[0, 2**bits)``): bit *b* of column *j* lands at interleaved
    position ``b*k + j``.  Pure shift/and/or expression tree — stays
    inside whole-stage codegen; total width ``bits*k`` must fit a
    long (``bits*k <= 62``)."""
    k = len(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds a long's width")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + j))
    return z


def normalize_to_bits(c: Column, lo: float, hi: float,
                      bits: int = 16) -> Column:
    """Affine map of a numeric column into ``[0, 2**bits)`` given its
    (collected-once) min/max — the rank proxy the interleave needs.
    Degenerate ranges (lo == hi) map to 0; NULLs map to 0 (they sort
    first, same as a parquet null-first stat)."""
    top = (1 << bits) - 1
    # None min/max (all-NULL column) degrades like a constant column:
    # that dimension contributes nothing to the interleave
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor((c.cast("double") - F.lit(float(lo)))
                     / F.lit(float(hi - lo)) * F.lit(float(top)))
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(top)).cast("long"),
        F.lit(0).cast("long"))


def stage_zordered(df: DataFrame, path: str, zorder_cols: list[str],
                   bits: int = 16, n_files: int = 16,
                   mode: str = "overwrite") -> str:
    """Write ``df`` z-order-clustered on ``zorder_cols`` (numeric or
    date/timestamp — dates are normalized through their epoch-day
    number).  One small agg job collects each column's min/max for the
    normalization; the write then range-partitions on the Morton key
    into ``n_files`` tasks and sorts within each, so every output
    file covers a compact k-dimensional bounding box.  The z column is
    dropped — the layout IS the artifact, the schema is unchanged."""
    if not zorder_cols:
        raise ValueError("zorder_cols must be non-empty")

    def as_num(name: str) -> Column:
        dt = df.schema[name].dataType.simpleString()
        if dt in ("date", "timestamp", "timestamp_ntz"):
            return F.unix_date(F.col(name).cast("date")).cast("double")
        return F.col(name).cast("double")

    stats = df.agg(*[f(as_num(c)).alias(f"{agg}_{i}")
                     for i, c in enumerate(zorder_cols)
                     for agg, f in (("lo", F.min), ("hi", F.max))]) \
        .collect()[0]
    norm = [normalize_to_bits(as_num(c), stats[f"lo_{i}"],
                              stats[f"hi_{i}"], bits)
            for i, c in enumerate(zorder_cols)]
    (df.withColumn("__z__", zvalue(norm, bits))
       .repartitionByRange(n_files, "__z__")
       .sortWithinPartitions("__z__")
       .drop("__z__")
       .write.mode(mode).parquet(path))
    return path


def _untruncated_plan(df: DataFrame) -> str:
    """Executed-plan string with scan metadata UN-truncated: the
    default ``spark.sql.maxMetadataStringLength`` (100) cuts the
    PushedFilters / PartitionFilters lists mid-entry, which silently
    breaks any parser counting their contents.  The bare ``conf.get``
    returns the EFFECTIVE value (set or built-in default), so the
    restore is exact either way — ``conf.get(key, None)`` would return
    None for an unset key and skip the restore, leaking the raised
    limit into the session."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "100000")
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


def pushed_filter_count(df: DataFrame) -> int:
    """Number of predicates pushed to ``df``'s (single-scan) parquet
    source — the audit that the filters actually reached the reader's
    row-group pruning (the ``dpp_filter_count`` idea applied to
    ordinary pushdown).  Counts entries inside the first
    ``PushedFilters: [...]`` list of the executed plan.  Both the
    list-end scan and the top-level comma count track paren AND
    square-bracket depth: a pushed ``In`` filter prints as
    ``In(col, [1,2,3])``, so stopping at the first ``]`` (or counting
    every comma) would truncate the capture mid-list and miscount."""
    plan = _untruncated_plan(df)
    start = plan.find("PushedFilters: [")
    if start < 0:
        return 0
    body_start = start + len("PushedFilters: [")
    depth, end = 0, -1
    for i in range(body_start, len(plan)):
        ch = plan[i]
        if ch in "([":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "]":
            if depth == 0:
                end = i
                break
            depth -= 1
    body = plan[body_start:end] if end >= 0 else plan[body_start:]
    if not body.strip():
        return 0
    depth, n = 0, 1
    for ch in body:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n
