"""Bucketed tables — the shuffle-amortization lever for repeated big
joins (SURVEY §4.2's "co-located joins via bucketing" made concrete).

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle
of both sides.  A bucketed table pays that shuffle ONCE at write time:
``bucketBy(n, key)`` routes rows to ``n`` stable buckets by
``hash(key) % n``, and every later equi-join (or aggregation) on the
bucket key reads the buckets as pre-partitioned input — Catalyst plans
a SortMergeJoin with ZERO Exchange on the bucketed side(s).  For a
fact table joined on the same key by every query of a workload
(lineitem ⋈ orders on the order key, events ⋈ sessions on user), the
one-time write converts every run's biggest exchange into a scan.

The reference engine has no physical layout control at all (its tables
live in SQLite, query_iterator.py:101-107); this module is part of the
scale surface, companion to ``sinks/parquet.py``'s compaction.

Mechanics worth knowing (and asserted in tests/test_bucketing.py):

* Bucketed tables are METASTORE tables (``saveAsTable``) — a plain
  ``.parquet(path)`` write cannot carry bucket metadata.  The session's
  ``spark.sql.warehouse.dir`` holds the files.
* Exchange elision requires ``spark.sql.sources.bucketing.enabled``
  (default true) and the join key to EQUAL the bucket key (a superset
  grouping also qualifies).
* Matching bucket counts on both sides elide BOTH exchanges; a
  one-sided bucketed join still elides that side's exchange.
* ``sortBy`` inside buckets additionally removes the per-task Sort
  before a SortMergeJoin when both sides are sorted by the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> str:
    """Write ``df`` as a bucketed (optionally in-bucket-sorted) parquet
    table in the session warehouse.  The write itself shuffles on the
    bucket key — the one-time cost every later co-located join
    amortizes.  Returns the table name."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if mode == "overwrite":
        # a managed table's FILES can outlive its catalog entry (each
        # local session starts a fresh in-memory catalog over the same
        # warehouse dir) — saveAsTable then fails LOCATION_ALREADY_
        # EXISTS; drop the entry and clear any orphaned location
        import shutil

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        for prefix in ("file://", "file:"):
            if wh.startswith(prefix):
                wh = wh[len(prefix):]
                break
        shutil.rmtree(f"{wh.rstrip('/')}/{table.lower()}",
                      ignore_errors=True)
    writer = (df.write.mode(mode).format("parquet")
              .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return table


def co_located_join(spark: SparkSession, left_table: str,
                    right_table: str, on: list[str],
                    how: str = "inner",
                    force_sort_merge: bool = False) -> DataFrame:
    """Join two warehouse tables on their (shared) bucket key.  When
    both were written with :func:`write_bucketed` on ``on`` with the
    same bucket count, the physical plan carries NO shuffle exchange —
    asserted by :func:`join_exchanges`.

    ``force_sort_merge`` adds a MERGE hint: at demo/test scale AQE
    would broadcast the small side (trivially exchange-free), which
    proves nothing about co-location — the hint pins the SortMergeJoin
    whose exchanges bucketing actually elides.  Leave False in
    production: a broadcastable side SHOULD broadcast."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)


def join_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in ``df``'s executed plan — the
    bucketing audit (0 for a fully co-located join).  Broadcast
    exchanges are not counted: they are the cheap path, not the
    amortization target."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def selected_buckets(df: DataFrame) -> list[tuple[int, int]]:
    """``(selected, total)`` per bucket-pruned scan in ``df``'s
    executed plan — the point-lookup audit companion to
    :func:`join_exchanges`.  A filter on the bucket key (equality /
    IN) lets the planner read only the buckets the key hashes to:
    the scan line carries ``SelectedBucketsCount: s out of n``.  At
    100 TB this is the difference between touching 1/512th of a fact
    table and scanning all of it for a point lookup.  Empty list ⇒
    no scan was bucket-pruned (either the table isn't bucketed, the
    predicate isn't on the bucket key, or the planner disabled the
    bucketed read because nothing consumed its distribution —
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled``)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return [(int(s), int(n)) for s, n in
            re.findall(r"SelectedBucketsCount:\s*(\d+)\s+out of\s+(\d+)",
                       plan)]
