"""The reference's two result combinators, as pure DataFrame operators.

* :func:`pivot_union` — the "pivot" combinator (query_iterator.py:141-158):
  vertically stack the per-file results of one query, prepending a
  provenance column literally named ``index`` that holds the
  extension-stripped source file name.  Union-all semantics (no dedup);
  requires compatible schemas (united by name).

* :func:`horizontal_concat` — the non-pivot combinator
  (query_iterator.py:180-181 / :207-208): side-by-side positional concat
  of per-file results (pandas ``pd.concat(axis=1)`` semantics — alignment
  by row position, shorter side null-padded).  Spark has no row identity,
  so each input gets a per-partition-computed global row number and the
  frames full-outer-join on it.  Works distributed at any size; at the
  reference's scale (small post-aggregate results) Catalyst broadcasts
  the joins automatically.

* :func:`prefix_columns` — the per-match column rename
  (query_iterator.py:111-119): every column prefixed ``{match}_``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..plans.macro import strip_extension

_ROWID = "__hconcat_row_id__"


def prefix_columns(df: DataFrame, match: str) -> DataFrame:
    """Prefix every column with ``{match}_`` (reference A11).  The match
    string keeps its extension, exactly as the reference does — the golden
    output has columns like ``consumer_complaints.xlsx_company``."""
    return df.toDF(*[f"{match}_{c}" for c in df.columns])


def pivot_union(named_results: list[tuple[str, DataFrame]]) -> DataFrame:
    """Vertical union with provenance (reference A12).

    ``named_results``: ``[(source_file_name, df), ...]``.  Output columns:
    ``index`` (extension-stripped file name) first, then the query's
    columns in their original order.  Union-by-name so file ordering never
    silently misaligns columns.
    """
    if not named_results:
        raise ValueError("pivot_union of zero results")
    tagged = [
        df.select(F.lit(strip_extension(name)).alias("index"), "*")
        for name, df in named_results
    ]
    return reduce(lambda a, b: a.unionByName(b), tagged)


def with_row_index(df: DataFrame, name: str = _ROWID) -> DataFrame:
    """Attach a 0-based dense global row index without a global sort.

    Uses ``zipWithIndex`` semantics built from partition offsets: a
    narrow ``spark_partition_id`` + per-partition ``row_number`` pass and
    a tiny driver-side offset map — no full shuffle, preserving the
    frame's existing row order (which, as in pandas, is the positional
    identity being concatenated on).
    """
    from pyspark.sql import Window

    part = F.spark_partition_id().alias("__pid__")
    with_pid = df.withColumn("__pid__", part)
    # per-partition counts → cumulative offsets (driver-side; #partitions is small)
    counts = with_pid.groupBy("__pid__").count().collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid__"]):
        offsets[row["__pid__"]] = acc
        acc += row["count"]
    offset_col = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("__pid__").orderBy(F.monotonically_increasing_id())
    return (
        with_pid
        .withColumn("__rn__", F.row_number().over(w) - 1)
        .withColumn(name, F.col("__rn__") + offset_col[F.col("__pid__")])
        .drop("__pid__", "__rn__")
    )


def horizontal_concat(dfs: list[DataFrame]) -> DataFrame:
    """Positional side-by-side concat (reference A13), ragged lengths
    null-padded exactly like ``pd.concat(axis=1)``.

    Column-name collisions across inputs are allowed (pandas allows
    duplicate column labels); callers that need unique names apply
    :func:`prefix_columns` first, as the reference pipeline does.
    """
    if not dfs:
        raise ValueError("horizontal_concat of zero frames")
    if len(dfs) == 1:
        return dfs[0]
    indexed = [with_row_index(df) for df in dfs]
    joined = reduce(lambda a, b: a.join(b, on=_ROWID, how="full_outer"), indexed)
    cols = [c for df in dfs for c in df.columns]
    out = joined.orderBy(_ROWID).drop(_ROWID)
    if not _all_unique(cols):
        return out
    # prefixed names contain dots (e.g. consumer_complaints.xlsx_company) —
    # backtick-quote so select() doesn't read them as qualified references
    return out.select(*[f"`{c.replace('`', '``')}`" for c in cols])


def _all_unique(xs: list[str]) -> bool:
    return len(xs) == len(set(xs))
