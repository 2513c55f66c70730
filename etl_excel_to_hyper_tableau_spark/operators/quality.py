"""Data-quality expectations: declarative row-level checks evaluated
in ONE aggregate pass.

The shape every production pipeline bolts on (dbt tests, Great
Expectations, Deequ): declare predicates, get a violations report.
The scale property that matters is that *all* checks share a single
scan + a single partial aggregate — each check is a
``sum(case when violated then 1 end)`` column, map-side combinable, so
the report costs one pass over 100 TB regardless of how many checks
run.  The per-check rows are unpivoted from the one-row aggregate
(stack over a 1-row frame — driver-free, trivially cheap).

Uniqueness checks need a second shape (duplicates are a property of
the whole column, not a row), expressed as ``count - count_distinct``
inside the same aggregate — still one pass, with the usual caveat that
count_distinct adds an expand; put uniqueness checks on key columns
only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_report(df: DataFrame, checks: dict[str, Column],
                 unique: list[str] | None = None) -> DataFrame:
    """Evaluate named row predicates (``True`` = row passes) plus
    optional column-uniqueness checks, in one aggregate pass.

    Output: ``check, n_violations, n_rows, passed`` — one row per
    check, deterministic order by check name.
    """
    if not checks and not unique:
        raise ValueError("no checks given")
    aggs = [F.count("*").alias("__n__")]
    names = []
    for name, pred in checks.items():
        names.append(name)
        # NULL predicate result counts as a violation (a row that can't
        # prove it passes doesn't pass) — coalesce, don't negate; the
        # outer coalesce makes an EMPTY frame report 0 violations /
        # passed=true instead of NULLs (sum over zero rows is NULL)
        aggs.append(F.coalesce(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)),
            F.lit(0)).cast("long").alias(f"__c_{len(names) - 1}__"))
    for col in unique or []:
        names.append(f"unique({col})")
        aggs.append((F.count(col) - F.countDistinct(col))
                    .cast("long").alias(f"__c_{len(names) - 1}__"))
    one = df.agg(*aggs)

    def _lit(n: str) -> str:  # escape backslashes, then quotes
        return n.replace("\\", "\\\\").replace("'", "''")

    stack = ", ".join(f"'{_lit(n)}', __c_{i}__" for i, n in enumerate(names))
    return (one.selectExpr(f"stack({len(names)}, {stack}) as (check, n_violations)",
                           "__n__ as n_rows")
            .withColumn("passed", F.col("n_violations") == 0)
            .orderBy("check"))
