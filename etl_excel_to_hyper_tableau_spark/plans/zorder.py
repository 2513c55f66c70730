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
    write_stats_manifest(path, zorder_cols)
    return path


def _stat_encode(v):
    """JSON-portable encoding of a pyarrow min/max statistic: datetimes
    and dates go to ISO strings (fixed-width, so LEXICOGRAPHIC order is
    chronological order — the comparison the pruner uses); numbers and
    strings pass through.  A tz-AWARE datetime (pyarrow emits these for
    UTC-adjusted timestamp columns) is first normalized to UTC-naive —
    otherwise its isoformat carries a ``+00:00`` suffix while a naive
    caller predicate (``datetime(1996, 3, 1)``) does not, and the
    lexicographic compare mis-evaluates boundary predicates: the pruner
    could then DROP a file containing satisfying rows, a silent row
    loss the residual filter cannot recover."""
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):  # pragma: no cover - raw byte_array stats
        return v.decode("utf-8", "replace")
    return v


def write_stats_manifest(path: str, columns: list[str]) -> str:
    """Emit ``<path>/_stats_manifest.json``: per-FILE min/max (merged
    across row groups) for ``columns`` — the missing piece between
    parquet's row-group stats (task-local skipping) and a Delta/Iceberg
    manifest (file-level skipping).  The underscore prefix makes the
    manifest invisible to Spark's parquet reader, so the staged
    directory stays a plain readable table.  Driver-side pyarrow footer
    reads, bounded by FILE count (16-ish per staging), never row count.
    A column whose stats are absent in some file records null there and
    the pruner keeps that file (conservative)."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    files = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(md.num_columns)}
        ent: dict = {"file": os.path.basename(f),
                     "rows": md.num_rows, "stats": {}}
        for col in columns:
            lo = hi = None
            ok = col in idx
            for rg in range(md.num_row_groups):
                st = (md.row_group(rg).column(idx[col]).statistics
                      if ok else None)
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            ent["stats"][col] = (
                {"min": _stat_encode(lo), "max": _stat_encode(hi)}
                if ok and md.num_row_groups > 0 else None)
        files.append(ent)
    manifest = os.path.join(path, "_stats_manifest.json")
    with open(manifest, "w") as fh:
        json.dump({"columns": columns, "files": files}, fh, indent=1)
    return manifest


def prune_files(path: str, predicates: list[tuple]) -> tuple:
    """Evaluate conjunctive range ``predicates`` — ``(col, op, value)``
    with op in ``>= > <= < =`` — against the staging's file-level
    min/max manifest and return ``(kept_paths, n_total)``.  A file is
    kept iff EVERY predicate's satisfying range overlaps the file's
    [min, max] bounding box; files with missing stats are kept
    (conservative — pruning is an optimization, the residual filter is
    the correctness boundary).  Values compare in the manifest's
    encoding: numbers numerically, strings/ISO-datetimes
    lexicographically (pass dates as ISO strings or datetime objects).

    ⚠ Timestamp predicate contract: manifest stats are UTC-naive (Spark
    writes timestamps as UTC-adjusted instants; tz-aware stats are
    normalized to UTC-naive by ``_stat_encode``).  A tz-AWARE predicate
    datetime is normalized the same way and is always safe.  A NAIVE
    predicate datetime is compared as-is, i.e. it is interpreted as
    **UTC wall-clock** — if the session timezone is not UTC and you mean
    session-local wall-clock, attach the tzinfo (or convert to UTC
    yourself) or boundary pruning can drop files with satisfying rows."""
    import json
    import os

    with open(os.path.join(path, "_stats_manifest.json")) as fh:
        man = json.load(fh)

    def overlaps(st: dict, op: str, value) -> bool:
        lo, hi = st["min"], st["max"]
        if lo is None or hi is None:
            return True
        v = _stat_encode(value)
        if op == ">=":
            return hi >= v
        if op == ">":
            return hi > v
        if op == "<=":
            return lo <= v
        if op == "<":
            return lo < v
        if op == "=":
            return lo <= v <= hi
        raise ValueError(f"unsupported op {op!r}")

    kept = []
    for ent in man["files"]:
        keep = True
        for col, op, value in predicates:
            st = ent["stats"].get(col)
            if st is None:
                continue  # no stats for this column: cannot prune on it
            if not overlaps(st, op, value):
                keep = False
                break
        if keep:
            kept.append(os.path.join(path, ent["file"]))
    # A parquet file present in the directory but ABSENT from the
    # manifest (an external append that never re-ran
    # write_stats_manifest) must be kept unconditionally — a stale
    # manifest may only lose pruning power, never rows.
    import glob
    listed = {ent["file"] for ent in man["files"]}
    unlisted = [f for f in sorted(glob.glob(os.path.join(path, "*.parquet")))
                if os.path.basename(f) not in listed]
    kept.extend(unlisted)
    return kept, len(man["files"]) + len(unlisted)


def read_file_pruned(spark, path: str, predicates: list[tuple]):
    """The file-skipping read path: prune the staging's files against
    ``predicates`` BEFORE ``spark.read`` — at 100 TB this is the
    Delta/Iceberg manifest prune (the scan never lists, opens, or
    schedules tasks for skipped files), built here from the staged
    ``_stats_manifest.json``.  Returns ``(df, n_read, n_total)``; the
    caller still applies the real filter (the manifest prunes FILES,
    the residual predicate prunes ROWS — correctness never depends on
    the manifest).  Zero surviving files returns the staging's empty
    prefix (limit 0) so the schema is identical."""
    kept, total = prune_files(path, predicates)
    if not kept:
        return spark.read.parquet(path).limit(0), 0, total
    return spark.read.parquet(*kept), len(kept), total


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
