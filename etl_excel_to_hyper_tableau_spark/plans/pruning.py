"""Partition-pruned layouts — the second physical-layout lever next to
bucketing (plans/bucketing.py): a fact table written ``partitionBy``
a coarse key (date/month at 100 TB) lets Catalyst prune whole
directories at planning time (static pruning, from literal predicates)
and at RUNTIME (dynamic partition pruning: the fact side's partition
filter is built from the JOINED dim side's rows, so a selective dim
filter skips fact partitions no literal predicate mentions).

The reference has no physical layout at all (SQLite staging,
query_iterator.py:101-107); SURVEY §4.2 lists partition pruning as a
Catalyst freebie "once staged to Parquet" — this module is that
staging made concrete, and :func:`dpp_filter_count` is the audit that
the runtime pruning actually planned (the same
physical-property-as-correctness idea as bucketing's
``join_exchanges``: the entry carries the count and the oracle pins
it, so a planner regression that silently full-scans the fact table
fails the value gate, not just a latency chart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stage_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      mode: str = "overwrite") -> str:
    """Write ``df`` as a directory-partitioned parquet layout — the
    one-time staging cost every pruned scan afterwards amortizes.
    Partition columns should be COARSE (day/month/source): at 100 TB a
    high-cardinality partition key degenerates into millions of tiny
    directories and kills the listing, which is why the id-grained
    co-location job belongs to bucketing, not partitioning."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return path


def static_partition_filter_count(df: DataFrame, col: str) -> int:
    """Number of scans in ``df``'s plan whose ``PartitionFilters``
    mention partition column ``col`` with a NON-EMPTY filter list —
    the static (literal-predicate) counterpart of
    :func:`dpp_filter_count`, for probes whose partition set is
    driver-known at plan time (e.g. the staged-IVFPQ cell probe, where
    the query batch's ``nprobe`` cells are computed before the scan is
    planned).  Static pruning is strictly stronger than DPP — the file
    index never even lists the skipped directories — and pinning the
    count in the oracle hash makes a regression to a full scan a
    CORRECTNESS failure, the bucketed_priority_census doctrine."""
    from .zorder import _untruncated_plan

    plan = _untruncated_plan(df)
    n = 0
    for line in plan.splitlines():
        if "PartitionFilters:" not in line:
            continue
        seg = line.split("PartitionFilters:", 1)[1].strip()
        if seg.startswith("[]"):
            continue
        if col in seg.split("]", 1)[0]:
            n += 1
    return n


def dpp_filter_count(df: DataFrame) -> int:
    """Number of scans with DYNAMIC partition-pruning filters in
    ``df``'s executed plan — 0 means every fact partition would be
    scanned; ≥1 means a scan's ``PartitionFilters`` carry a
    ``dynamicpruningexpression`` subquery fed by the dim side at
    runtime.  (Counts ``PartitionFilters`` lines mentioning the
    expression, not raw substring hits — one pruning filter prints the
    ``dynamicpruning`` token several times in a plan string.)

    Reads the plan with scan metadata un-truncated (plans/zorder.py's
    ``_untruncated_plan``): the default 100-char metadata limit can cut
    a multi-filter PartitionFilters list BEFORE the
    dynamicpruningexpression token, under-counting real pruning."""
    from .zorder import _untruncated_plan

    plan = _untruncated_plan(df)
    return sum(1 for line in plan.splitlines()
               if "PartitionFilters" in line
               and "dynamicpruningexpression" in line)
