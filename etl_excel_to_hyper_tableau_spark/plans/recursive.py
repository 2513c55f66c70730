"""Iterative fixpoint evaluation — the driver-loop complement to
Spark's recursive CTEs (SURVEY §2C).

Spark 4.1 executes ``WITH RECURSIVE … UNION ALL`` natively (the
engine's sqlite dialect passes it straight through), but rejects the
``UNION``-distinct form with ``UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE``
— and the distinct form is exactly the one SQLite users write for
graph closures, where dedup is what makes cyclic recursion terminate.

Two layers close that hole:

* :func:`recursive_fixpoint` — the programmatic UNION-semantics
  evaluator: start from the base relation, repeatedly apply the step
  to the rows added in the previous round (the "working table", as in
  the SQL standard), keep only never-seen rows, stop when a round adds
  nothing.  Each round is one distributed job; the driver holds no
  data — only the loop counter.  ``localCheckpoint`` truncates the
  lineage every round so the plan doesn't grow unboundedly (the
  classic iterative-algorithm failure mode on Spark).
* :func:`run_recursive_union_sql` — the SQL front door: parses the
  single-CTE ``WITH RECURSIVE name(cols) AS (base UNION step) main``
  shape at the string level (literal-masked, balanced-paren scan —
  same mechanics as :mod:`.dialect`) and drives
  :func:`recursive_fixpoint` over it, so a user pasting SQLite
  recursive SQL through :class:`...engine.QueryEngine` gets the right
  answer instead of an analyzer error.
"""

from __future__ import annotations

import re
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


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
    base_shape = [(f.name, f.dataType) for f in base.schema.fields]
    for i in range(max_iterations):
        new = step(frontier)
        # compare (name, type) — nullability legitimately differs between
        # a checkpointed base and a freshly-analyzed step output
        if [(f.name, f.dataType) for f in new.schema.fields] != base_shape:
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


# ---------------------------------------------------------------------------
# SQL front door for the UNION-distinct recursive CTE
# ---------------------------------------------------------------------------

_WITH_RECURSIVE_RE = re.compile(
    r"^\s*WITH\s+RECURSIVE\s+(\w+)\s*(?:\(\s*([\w\s,]*?)\s*\))?\s*AS\s*\(",
    re.IGNORECASE)
_UNION_RE = re.compile(r"\bUNION\b(\s+ALL\b)?", re.IGNORECASE)


def _parse_recursive(sql: str):
    """Parse ``WITH RECURSIVE name(cols) AS ( body ) rest`` with a
    literal-masked balanced scan.  Returns a dict (or None when the SQL
    is not a recursive CTE): ``name, cols, base_sql, step_sql,
    union_all, main_sql, multi_cte`` — ``union_all`` is None when the
    body has no top-level UNION (a non-recursive CTE merely spelled
    WITH RECURSIVE), ``multi_cte`` flags additional CTEs after the
    recursive one."""
    from .dialect import _mask_literals, _unmask

    code, literals = _mask_literals(sql)
    m = _WITH_RECURSIVE_RE.match(code)
    if not m:
        return None
    name = m.group(1)
    cols = [c.strip() for c in m.group(2).split(",")] if m.group(2) else None
    depth, j = 1, m.end()
    while j < len(code) and depth:
        if code[j] == "(":
            depth += 1
        elif code[j] == ")":
            depth -= 1
        j += 1
    body, rest = code[m.end():j - 1], code[j:]
    # first top-level UNION splits base from the recursive step
    split = None
    for um in _UNION_RE.finditer(body):
        before = body[:um.start()]
        if before.count("(") - before.count(")") == 0:
            split = um
            break
    if split is None:
        return {"name": name, "cols": cols, "base_sql": None,
                "step_sql": None, "union_all": None,
                "main_sql": _unmask(rest, literals).strip(),
                "multi_cte": rest.lstrip().startswith(",")}
    return {
        "name": name, "cols": cols,
        "base_sql": _unmask(body[:split.start()], literals).strip(),
        "step_sql": _unmask(body[split.end():], literals).strip(),
        "union_all": bool(split.group(1)),
        "main_sql": _unmask(rest, literals).strip(),
        "multi_cte": rest.lstrip().startswith(","),
    }


def is_recursive_union(sql: str) -> bool:
    """True iff ``sql`` is a ``WITH RECURSIVE`` whose recursive arm uses
    the UNION-distinct form Spark cannot run natively (Spark 4.1 raises
    UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE for it; UNION ALL and
    non-self-referencing shapes pass through to the native executor)."""
    p = _parse_recursive(sql)
    if p is None or p["union_all"] is not False:
        return False
    # true recursion only: the step arm must reference the CTE name
    return bool(re.search(rf"\b{re.escape(p['name'])}\b", p["step_sql"],
                          re.IGNORECASE))


def run_recursive_union_sql(spark: SparkSession, sql: str,
                            max_iterations: int = 100) -> DataFrame:
    """Evaluate a UNION-distinct ``WITH RECURSIVE`` by driving
    :func:`recursive_fixpoint`: the base arm seeds the accumulator, the
    recursive arm re-runs each round against the previous round's new
    rows (registered as a temp view in place of the CTE name), and the
    main query runs over the accumulated fixpoint.  Dedup across rounds
    is what makes cyclic graphs terminate — the semantics SQLite users
    rely on for closures."""
    p = _parse_recursive(sql)
    if p is None or p["union_all"] is None:
        raise ValueError("not a recursive WITH RECURSIVE statement")
    if p["multi_cte"]:
        raise NotImplementedError(
            "WITH RECURSIVE (UNION-distinct) with additional CTEs is not "
            "supported by the SQL front door; evaluate the recursion with "
            "plans.recursive.recursive_fixpoint and join the rest as "
            "DataFrames")
    name, cols = p["name"], p["cols"]
    base_sql, step_sql, main_sql = p["base_sql"], p["step_sql"], p["main_sql"]
    if p["union_all"]:
        # Spark runs this natively; no driver loop needed
        return spark.sql(sql)

    tag = uuid.uuid4().hex[:8]
    frontier_view = f"__rec_frontier_{name}_{tag}"
    result_view = f"__rec_result_{name}_{tag}"
    name_re = re.compile(rf"\b{re.escape(name)}\b", re.IGNORECASE)

    base = spark.sql(base_sql)
    if cols:
        base = base.toDF(*cols)
    base = base.distinct()  # SQL UNION dedups the base arm too
    step_tmpl = name_re.sub(frontier_view, step_sql)

    from pyspark.sql import functions as F

    def step(frontier: DataFrame) -> DataFrame:
        frontier.createOrReplaceTempView(frontier_view)
        out = spark.sql(step_tmpl).toDF(*base.columns)
        # the anchor arm fixes the CTE's column types (the usual SQL
        # rule); cast the recursive arm to them
        return out.select(*[
            F.col(f.name).cast(f.dataType) for f in base.schema.fields])

    try:
        acc = recursive_fixpoint(base, step, max_iterations=max_iterations)
        acc.createOrReplaceTempView(result_view)
        return spark.sql(name_re.sub(result_view, main_sql))
    finally:
        spark.catalog.dropTempView(frontier_view)
        # result_view stays registered only until the session ends; the
        # returned DataFrame's plan is already resolved against it
