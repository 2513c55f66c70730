"""Skew-handling utilities: salted joins and bucketed staging.

AQE's skew-join splitting (on by default, `session.py`) handles most
skew at runtime by splitting oversized sort-merge partitions.  Two
cases still need explicit treatment at 100 TB, and these helpers are
the standard recipes:

* :func:`salted_join` — when one fact-side key is so hot that even a
  split partition is dominated by a single key (AQE can split a
  partition, not a key).  The hot side's keys gain a random salt in
  [0, salt_factor); the other side is replicated salt_factor times so
  every (key, salt) bucket can still match.  Replication is by literal
  explode — no Python, one extra narrow stage.

* :func:`stage_bucketed` / :func:`read_bucketed` — co-located joins:
  write both fact tables bucketed by the join key once at staging
  time, and every subsequent equi-join on that key runs with **no
  exchange on either side** (verified by plan assertions in tests).
  This is the Parquet-staging half of the engine's Excel→Parquet
  scale story (SURVEY §7 M6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join where ``skewed`` has hot values in ``key``.

    ``skewed`` gets a uniform random salt column; ``other`` is exploded
    ``salt_factor``× (one copy per salt value) so the join key becomes
    (key, salt) — the hot key's rows now spread over ``salt_factor``
    shuffle partitions.  Result columns = the plain join's columns.

    Correctness does not depend on the salt values (every row of
    ``other`` exists for every salt), so ``rand()``'s non-determinism
    is load-balancing only.  Cost: ``other`` is replicated — use it
    fact-to-dim-too-big-to-broadcast, not fact-to-fact.
    """
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    salted_l = skewed.withColumn(
        "__salt__", (F.rand() * salt_factor).cast("int"))
    salted_r = other.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])))
    out = salted_l.join(salted_r, [key, "__salt__"], how)
    return out.drop("__salt__")


def stage_bucketed(df: DataFrame, table_name: str, key: str,
                   buckets: int = 32, sort_by: str | None = None) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed
    parquet table.  Joins between two tables bucketed on the same key
    with the same bucket count skip the exchange entirely; sorting
    within buckets also skips the sort of a sort-merge join."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def key_skew_report(df: DataFrame, key: str, topk: int = 10) -> DataFrame:
    """Skew diagnostics for a prospective join/groupBy key: the ``topk``
    heaviest key values with their row counts, share of the table, and
    the multiple of a perfectly-uniform key's load — the report you
    read BEFORE choosing between a plain join, AQE skew splitting, and
    :func:`salted_join` (a key whose ``hot_factor`` exceeds the
    executor-partition budget needs salting; AQE can split a partition
    but not a key).

    Plan: one partial-agg ``groupBy(key)`` (hot keys combine map-side —
    the diagnostic never amplifies the skew it measures), the totals as
    a broadcast one-row aggregate over the SAME key-count lineage, and
    the top-k via sort+limit — Spark's ``TakeOrderedAndProject``
    (per-partition partial top-k, no full sort): a near-unique key has
    corpus-scale cardinality, so a global rank window here would be the
    single-reducer plan this module exists to avoid.  The row_number
    runs on the ≤ topk survivors only.

    Output: ``key_value (string), n_rows, share, hot_factor, rank``
    (``hot_factor`` = n_rows × n_distinct_keys / total_rows; 1.0 ⇒
    perfectly uniform).
    """
    from pyspark.sql import Window

    counts = (df.groupBy(F.col(key).cast("string").alias("key_value"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    totals = counts.agg(F.sum("n_rows").alias("__total__"),
                        F.count(F.lit(1)).alias("__n_keys__"))
    top = (counts.orderBy(F.col("n_rows").desc(), F.col("key_value"))
           .limit(topk))
    rank = Window.orderBy(F.col("n_rows").desc(), F.col("key_value"))
    return (top.crossJoin(F.broadcast(totals))
            .select("key_value",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    (F.col("n_rows") / F.col("__total__").cast("double"))
                    .alias("share"),
                    (F.col("n_rows") * F.col("__n_keys__")
                     / F.col("__total__").cast("double")).alias("hot_factor"))
            .withColumn("rank", F.row_number().over(rank))
            .select("key_value", "n_rows", "share", "hot_factor",
                    F.col("rank").cast("long").alias("rank")))
