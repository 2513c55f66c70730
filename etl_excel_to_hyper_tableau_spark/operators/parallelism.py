"""Parallelism guard for compute-bound stages.

A Spark file scan's partition count follows the input *layout* (file
count, row-group boundaries, maxPartitionBytes) — correct for
scan-bound work, wrong for compute-bound work: a small parquet file is
one row group, so a single task would run the entire per-row transform
(shingling, hashing, feature extraction) on one core no matter how many
the cluster has.  :func:`spread` decouples the two: if the incoming
plan has fewer partitions than the cluster's parallelism, round-robin
repartition before the heavy map; otherwise it is a no-op (at 100 TB
the scan already yields ~800k partitions and no shuffle is added).

The dedup/text/similarity operators call this on their text/vector
inputs — the shuffled bytes are the raw column being transformed, which
is orders of magnitude smaller than the exploded/hashed intermediates
the transform then produces in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff it
    currently has fewer partitions than that.  Plan-metadata only — no
    job is triggered by the partition-count probe."""
    target = int(df.sparkSession.sparkContext.defaultParallelism * min_factor)
    if target <= 1:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: unresolvable plans
        return df
    return df.repartition(target) if current < target else df
