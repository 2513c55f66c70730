"""Mergeable frequency sketches: count-min (Cormode & Muthukrishnan,
"An Improved Data Stream Summary: The Count-Min Sketch and its
Applications", J. Algorithms 2005).

Completes the approximate-aggregation family next to the built-in
HyperLogLog++ / quantile sketches (`sketch_profile` entry): CMS answers
point-frequency queries ("how often does key k appear?") from d×w
counters — fixed-size state no matter the stream length, cell-wise
additive across partitions/batches, over-estimating only.

Everything is deterministic md5 hashing (``functions.hashing`` row
doctrine), so unlike the engine-specific HLL state the whole sketch is
reproducible bit-for-bit by an external SQL oracle — the estimates are
driver-verifiable, not just error-bounded.

Scale shape: the build is a map-only ×d expansion followed by ONE
partial-agg groupBy onto d×w cells — every input partition contributes
at most d×w rows to the exchange regardless of row count (the same
fixed-communication property as HLL).  The sketch table itself is
metadata-sized (d×w rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import md5_int64


def _cms_bucket(key: Column, depth: Column, width: int) -> Column:
    """Row's counter column for one hash row: md5 of ``depth:key`` mod
    width — portable to any engine with md5 + int64 (DuckDB oracle
    reproduces it exactly)."""
    return md5_int64(
        F.concat(depth.cast("string"), F.lit(":"), key.cast("string"))
    ) % F.lit(width)


def count_min_build(df: DataFrame, key_col: str,
                    depth: int = 3, width: int = 256) -> DataFrame:
    """Build the d×w count-min sketch of ``key_col``'s frequency
    distribution.  Output: ``depth, bucket, cnt`` — exactly
    ``depth × width`` possible rows (absent cells are zero).

    Merge rule: sketches over disjoint data UNION then re-aggregate
    (cell-wise addition) — what makes CMS the right shape for
    per-batch/streaming accumulation.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = (df.select(F.col(key_col).alias("k"))
            .where(F.col("k").isNotNull())
            .select("k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
                    .alias("depth")))
    return (rows.select("depth",
                        _cms_bucket(F.col("k"), F.col("depth"), width)
                        .alias("bucket"))
            .groupBy("depth", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def count_min_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                       depth: int = 3, width: int = 256) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a built sketch:
    ``est(k) = min over hash rows of cnt[depth][bucket(depth, k)]`` —
    an upper bound on the true count, exact when no colliding key
    shares all d cells.

    Plan: the probe side expands ×d (map-only), equi-joins the
    metadata-sized sketch on (depth, bucket) — broadcast by size — and
    takes one min per key.  Probing never touches the original data.

    Output: ``key (string), est``.
    """
    probes = (keys.select(F.col(key_col).cast("string").alias("key"))
              .distinct()
              .select("key", F.explode(F.sequence(F.lit(0),
                                                  F.lit(depth - 1)))
                      .alias("depth")))
    probes = probes.select(
        "key", "depth",
        _cms_bucket(F.col("key"), F.col("depth"), width).alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return (joined.groupBy("key")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))
