"""Parquet sink — the scale-native export target (not in the reference;
added because a 100 TB pipeline's results are themselves large).

One parquet directory per query result under ``{path}/{query_name}/``,
written fully distributed (no driver collect).  This is the sink every
intermediate stage should use; Hyper/Excel are final-mile exports of
small aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(path: str, results: list[tuple[str, DataFrame]],
                  mode: str = "overwrite",
                  partition_by: dict[str, list[str]] | None = None) -> str:
    partition_by = partition_by or {}
    for name, df in results:
        writer = df.write.mode(mode)
        cols = partition_by.get(name)
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(f"{path.rstrip('/')}/{name}")
    return path
