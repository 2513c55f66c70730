"""Iterative fixpoint evaluation — the driver-loop replacement for
recursive CTEs (SURVEY §2C: SQLite supports ``WITH RECURSIVE``; Spark
SQL does not, and the documented mapping is an iterative driver loop).

``recursive_fixpoint`` implements the UNION-semantics recursive CTE:
start from the base relation, repeatedly apply the step to the rows
added in the previous round (the "working table", as in the SQL
standard), keep only never-seen rows, and stop when a round adds
nothing.  Each round is one distributed job; the driver holds no data —
only the loop counter.  ``localCheckpoint`` truncates the lineage every
round so the plan doesn't grow unboundedly (the classic iterative-
algorithm failure mode on Spark).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def recursive_fixpoint(base: DataFrame,
                       step: Callable[[DataFrame], DataFrame],
                       max_iterations: int = 100,
                       checkpoint_every: int = 1) -> DataFrame:
    """UNION-semantics recursive CTE: ``WITH RECURSIVE r AS (base UNION
    step(r)) SELECT * FROM r`` — except ``step`` receives only the
    previous round's *new* rows (the standard's working table), which is
    both the semantics and the efficiency of SQL engines' recursive
    evaluation.

    ``step`` maps a DataFrame to a DataFrame with the same schema
    (checked).  Rows are compared whole-row for the dedup, as UNION
    does.  Raises after ``max_iterations`` rounds to guard against
    non-terminating recursion (SQLite's equivalent guard is
    ``SQLITE_LIMIT_WORKER_THREADS``-less infinite loop protection via
    LIMIT — callers there typically add one; here the bound is
    explicit).
    """
    acc = base.localCheckpoint(eager=True)
    frontier = acc
    for i in range(max_iterations):
        new = step(frontier)
        if new.schema != base.schema:
            raise ValueError(
                f"step changed the schema: {new.schema.simpleString()} != "
                f"{base.schema.simpleString()}")
        new = new.exceptAll(acc).distinct()
        if checkpoint_every and i % checkpoint_every == 0:
            new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            return acc
        acc = acc.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    raise RuntimeError(f"no fixpoint after {max_iterations} iterations")
