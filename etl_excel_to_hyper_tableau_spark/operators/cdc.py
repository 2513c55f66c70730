"""Change-data-capture compaction operators.

The reference's pipeline is snapshot-in/snapshot-out (every run rebuilds
its `.hyper` extract from the full Excel inputs — query_iterator.py runs
each query over freshly-registered sheets).  At 100 TB the input is not
a snapshot but an append-only change log, and the two ubiquitous
compactions over such a log are:

* :func:`latest_snapshot` — "current state": one row per key, the
  newest version.  Implemented as a ``max(struct(...))`` aggregate
  rather than a ``row_number`` window: the aggregate gets a map-side
  partial (each input partition reduces to ≤ |keys| rows before the
  exchange), so shuffle traffic is bounded by key cardinality, while a
  window must shuffle and sort *every* version of every key.  Same
  single-shuffle count, far fewer shuffled bytes on high-churn logs.
  (Struct max plans as a SortAggregate — the partial pays a per-
  partition sort instead of a hash table, but the shuffle-bytes bound,
  the part that matters at scale, is identical.)

* :func:`scd2_intervals` — "full history, deduplicated": slowly-
  changing-dimension type-2 intervals.  Consecutive versions whose
  tracked attributes did not change are collapsed; each surviving
  change-point becomes a row with ``valid_from`` / ``valid_to``
  (NULL = still current) and an ``is_current`` flag.  Two window passes
  over the same ``(key)`` partitioning — Catalyst plans them in one
  Exchange + one Sort (the second Window reuses the first's ordering),
  so the whole history build is a single shuffle, linear per key.

Determinism: versions are ordered by ``(ts, tiebreak)``; pass a unique
``tiebreak`` column (an event id / LSN) whenever one timestamp can hold
several versions of a key, otherwise which tied version wins is
unspecified (exactly the contract of SQL ``row_number`` without a total
order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_snapshot(df: DataFrame, key: str, ts: str,
                    tiebreak: str | None = None) -> DataFrame:
    """One row per ``key``: the version with the greatest
    ``(ts, tiebreak)``.  Column order is preserved.

    Plan shape: partial aggregate (map-side combine; sort-based for
    struct max) → single exchange on ``key`` → final aggregate.  No
    window, no shuffle of the full history.
    """
    order_cols = [ts] + ([tiebreak] if tiebreak else [])
    payload = [c for c in df.columns if c != key]
    # max_by, not max(struct(order, payload)): only the ORDER columns
    # enter the comparison, so unorderable payload types (maps — a
    # common CDC attribute shape) work, and payload values never decide
    # tie winners beyond the documented unspecified-tie contract
    packed = F.max_by(F.struct(*[F.col(c) for c in payload]),
                      F.struct(*[F.col(c) for c in order_cols])).alias("__m__")
    agg = df.groupBy(key).agg(packed)
    return agg.select(key, *[F.col(f"__m__.{c}").alias(c) for c in payload])


def scd2_intervals(df: DataFrame, key: str, ts: str, attrs: list[str],
                   tiebreak: str | None = None) -> DataFrame:
    """Collapse an append-only change log into SCD type-2 history rows.

    A version is a *change-point* when any column in ``attrs`` differs
    from the previous version of the same key (NULL-safe comparison;
    the first version of a key is always a change-point).  Output:
    ``key``, ``attrs``, ``valid_from`` (the change-point's ``ts``),
    ``valid_to`` (next change-point's ``ts``, NULL while current) and
    ``is_current``.

    Both windows partition on ``key`` → one Exchange, one Sort in the
    physical plan; memory per task is one key-group's history (spillable
    sort), never the whole table.
    """
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # NULL-safe "any attribute changed vs previous version"
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.lag(ts).over(w).isNull() & (
        F.lit(True) if not tiebreak
        else F.lag(tiebreak).over(w).isNull())
    points = (df.withColumn("__chg__", changed | first)
              .filter(F.col("__chg__"))
              .select(key, *attrs, F.col(ts).alias("valid_from"),
                      *( [F.col(tiebreak).alias("__tb__")] if tiebreak else [])))
    order2 = [F.col("valid_from").asc()] + \
        ([F.col("__tb__").asc()] if tiebreak else [])
    w2 = Window.partitionBy(key).orderBy(*order2)
    out = (points
           .withColumn("valid_to", F.lead("valid_from").over(w2))
           .withColumn("is_current", F.col("valid_to").isNull()))
    return out.drop("__tb__") if tiebreak else out


def merge_upsert(spark, target_dir: str, updates: DataFrame, key: str,
                 ts: str, tiebreak: str | None = None,
                 delete_col: str | None = None,
                 retain_tombstones: bool = True) -> dict:
    """MERGE INTO emulation for plain parquet tables: union the current
    table with an updates batch, keep the latest version per key
    (:func:`latest_snapshot`), and atomically swap the rewritten table
    into place.

    ``delete_col``: optional boolean tombstone column — a key whose
    *latest* version carries ``delete_col = true`` is a CDC delete.
    With ``retain_tombstones`` (the default) the tombstone row stays in
    the written table, ``delete_col`` and all, so the delete is durable
    against out-of-order batches: a later merge carrying an *older*-ts
    version of the deleted key loses to the tombstone in
    latest-version-wins and the key stays dead.  Read live rows through
    :func:`read_merged`, which filters tombstones out.  With
    ``retain_tombstones=False`` the tombstoned keys are physically
    dropped and the column is not written (smaller table, but a
    straggler batch with an older ts can resurrect a deleted key —
    only safe when upstream guarantees per-key ts monotonicity across
    batches).

    The swap is write-to-side-directory + two renames — atomic on a
    POSIX/HDFS-style filesystem, which is the right local model; on an
    object store this operator is where a real deployment reaches for a
    table format (Delta/Iceberg/Hudi) whose MERGE is exactly this plan
    plus a transactional manifest.  Cost: one full rewrite per merge —
    correct and simple; production deployments amortize by batching
    updates (the updates frame can be arbitrarily large) or
    partitioning the target and merging only touched partitions.

    Returns {"rows", "keys_deleted"}.
    """
    import os
    import shutil

    tmp = target_dir.rstrip("/") + "__merge_tmp"
    old = target_dir.rstrip("/") + "__merge_old"
    # crash recovery from a previous interrupted merge BEFORE reading:
    # old present + target missing = we died between the two renames →
    # roll the old table back; old present + target present = we died
    # after the swap → finish the cleanup.  Stale tmp is always junk.
    if os.path.exists(old):
        if not os.path.exists(target_dir):
            os.rename(old, target_dir)
        else:
            shutil.rmtree(old)
    shutil.rmtree(tmp, ignore_errors=True)

    # only a genuinely absent target means "first merge" — any other
    # read failure (corrupt footer, transient FS error) must surface,
    # otherwise the swap below would replace the table with one batch
    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
    else:
        current = None
    up = updates
    if delete_col and delete_col not in up.columns:
        up = up.withColumn(delete_col, F.lit(False))
    if current is not None:
        if delete_col and delete_col not in current.columns:
            current = current.withColumn(delete_col, F.lit(False))
        up = current.unionByName(up)
    latest = latest_snapshot(up, key, ts, tiebreak=tiebreak)
    pinned = None
    if delete_col and not retain_tombstones:
        # pin ONE snapshot of the merge result so the tombstone count
        # and the written rows come from the same materialization (two
        # independent jobs over the lineage could diverge under
        # nondeterministic tie-breaking).  NULL tombstone = not a
        # delete (coalesce — a bare ~col drops NULL rows uncounted).
        pinned = latest.persist()
        tomb = F.coalesce(F.col(delete_col), F.lit(False))
        latest = pinned.filter(~tomb).drop(delete_col)
    latest.write.mode("overwrite").parquet(tmp)
    # row count from parquet footers — no second scan of the table
    import pyarrow.parquet as pq
    n = 0
    for root, _d, files in os.walk(tmp):
        for f in files:
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    deleted = 0
    if delete_col:
        tomb = F.coalesce(F.col(delete_col), F.lit(False))
        if retain_tombstones:
            # derived from the WRITTEN table (tmp) — the count always
            # agrees with the bytes on disk.  keys_deleted is the keys
            # deleted BY THIS MERGE (newly-tombstoned vs the pre-merge
            # table), not the cumulative tombstones retained on disk —
            # otherwise every later merge would re-report historical
            # deletes and the two modes' metrics would disagree.
            written_tomb = spark.read.parquet(tmp).filter(tomb)
            n_tomb_rows = written_tomb.count()
            n -= n_tomb_rows  # "rows" = live rows in both modes
            new_tomb_keys = written_tomb.select(key)
            if current is not None:
                prev_tomb_keys = current.filter(tomb).select(key)
                # counted before the directory swap below — `current`
                # still reads the pre-merge paths here
                deleted = (new_tomb_keys
                           .join(prev_tomb_keys, key, "left_anti")
                           .count())
            else:
                deleted = n_tomb_rows
        else:
            deleted = pinned.filter(tomb).count()
            pinned.unpersist()
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)
    return {"rows": n, "keys_deleted": deleted}


def read_merged(spark, target_dir: str,
                delete_col: str | None = None) -> DataFrame:
    """Read the live rows of a :func:`merge_upsert`-maintained table:
    with ``delete_col`` set, tombstoned keys are filtered out and the
    tombstone column dropped (parquet predicate pushdown makes the
    filter scan-time work, no shuffle)."""
    df = spark.read.parquet(target_dir)
    if delete_col and delete_col in df.columns:
        df = (df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
              .drop(delete_col))
    return df


def point_in_time_lookup(events: DataFrame, changes: DataFrame, key: str,
                         event_ts: str, change_ts: str, attrs: list[str],
                         tiebreak: str | None = None,
                         prefix: str = "v_") -> DataFrame:
    """Point-in-time-correct attribute lookup — the feature-store join
    that prevents training-serving skew: for every event, the attribute
    VERSION that was valid at the event's timestamp (never a later
    one — joining the latest snapshot leaks the future into training
    features).

    Composition of two existing linear-plan operators:
    :func:`scd2_intervals` collapses the change log into versions, and
    :func:`~.interval.asof_join` matches each event to the greatest
    ``valid_from <= event_ts`` within the key — one window shuffle
    each, no theta join, per-key history bounded.  When several
    change-points share a ``valid_from`` instant the LATEST by
    ``tiebreak`` wins (the state after all same-instant changes) so the
    as-of right side is unique per (key, ts) and the match is
    deterministic.  Inner semantics: events before a key's first
    version drop (they HAVE no valid feature version — surfacing that
    beats silently nulling).

    Output: event columns + ``{prefix}{event_ts}`` (the matched
    version's valid_from) + ``{prefix}{attr}`` per attribute.
    """
    from pyspark.sql import Window

    from .interval import asof_join

    src = changes
    if tiebreak is not None:
        # collapse same-instant change rows to the LAST by tiebreak
        # before versioning, so the as-of right side is unique per
        # (key, ts) and the match deterministic
        last = Window.partitionBy(key, change_ts).orderBy(
            F.col(tiebreak).desc())
        src = (changes.withColumn("__rn__", F.row_number().over(last))
               .where(F.col("__rn__") == 1).drop("__rn__"))
    hist = scd2_intervals(src, key, change_ts, attrs, tiebreak=tiebreak)
    right = hist.select(key, F.col("valid_from").alias(event_ts), *attrs)
    return asof_join(events, right, key, event_ts, direction="backward",
                     right_prefix=prefix)


def corpus_diff(df_old: DataFrame, df_new: DataFrame, id_col: str,
                content_col: str) -> DataFrame:
    """Dataset-release diff: classify every document id across two
    corpus snapshots as ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` by content hash — the audit a training-data release
    publishes next to its data card ("v2 adds 1.2M docs, removes 40k,
    rewrites 3k"), and the input to incremental re-processing (only
    ``added``+``changed`` need re-embedding/re-dedup).

    One full-outer join on the id key; content equality is md5 of the
    content column (computed in the same projection as the scan — no
    second pass), so "changed" means bytes changed, not object
    identity.  Map-side everything except the single id-keyed
    exchange; at 100 TB both sides shuffle once on the high-entropy id.

    Output: ``id, status, old_hash, new_hash`` (hashes NULL on the
    absent side), one row per id in either snapshot.
    """
    o = df_old.select(F.col(id_col).alias("id"),
                      F.md5(F.col(content_col).cast("string"))
                       .alias("old_hash"))
    n = df_new.select(F.col(id_col).alias("id"),
                      F.md5(F.col(content_col).cast("string"))
                       .alias("new_hash"))
    j = o.join(n, "id", "full_outer")
    status = (F.when(F.col("old_hash").isNull(), F.lit("added"))
              .when(F.col("new_hash").isNull(), F.lit("removed"))
              .when(F.col("old_hash") == F.col("new_hash"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select("id", status.alias("status"), "old_hash", "new_hash")
