"""WITH RECURSIVE front door (plans.recursive.run_recursive_union_sql +
engine routing): Spark 4.1 runs the UNION ALL form natively; the
UNION-distinct form — the SQLite cyclic-closure idiom — is driven
through recursive_fixpoint.  DuckDB runs the identical SQL as oracle."""

import duckdb
import pytest

from etl_excel_to_hyper_tableau_spark.bundles import Query
from etl_excel_to_hyper_tableau_spark.engine import QueryEngine
from etl_excel_to_hyper_tableau_spark.plans.recursive import (
    is_recursive_union, run_recursive_union_sql,
)

COUNTER_ALL = ("WITH RECURSIVE cnt(x) AS (SELECT 1 UNION ALL "
               "SELECT x + 1 FROM cnt WHERE x < 10) "
               "SELECT sum(x) AS s FROM cnt")
# cyclic graph: UNION ALL would never terminate; UNION-dedup must
CYCLE_UNION = ("WITH RECURSIVE reach(n) AS (SELECT 1 AS n UNION "
               "SELECT d FROM reach JOIN edges_t ON s = n) "
               "SELECT n FROM reach ORDER BY n")


def test_is_recursive_union_classifier():
    assert not is_recursive_union(COUNTER_ALL)           # native path
    assert is_recursive_union(CYCLE_UNION)
    assert not is_recursive_union("SELECT 1")
    # WITH RECURSIVE spelled on a non-recursive CTE: native path
    assert not is_recursive_union(
        "WITH RECURSIVE t AS (SELECT 1 AS x) SELECT x FROM t")


def test_union_distinct_cycle_matches_duckdb(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    spark.createDataFrame(edges, "s long, d long") \
         .createOrReplaceTempView("edges_t")
    got = [r["n"] for r in run_recursive_union_sql(spark, CYCLE_UNION).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE edges_t AS SELECT * FROM (VALUES "
                + ", ".join(f"({s}, {d})" for s, d in edges) + ") v(s, d)")
    want = [r[0] for r in con.execute(CYCLE_UNION).fetchall()]
    assert got == want == [1, 2, 3, 4]


def test_engine_routes_both_recursive_forms(spark, tmp_path):
    eng = QueryEngine(spark, str(tmp_path), [], str(tmp_path))
    # UNION ALL → native Spark recursion
    out = eng.run_query(Query("c", COUNTER_ALL), "f.xlsx").collect()
    assert out[0]["s"] == 55
    # UNION distinct → fixpoint driver (cyclic, so native would reject
    # and a naive UNION ALL rewrite would hang)
    spark.createDataFrame([(1, 2), (2, 1)], "s long, d long") \
         .createOrReplaceTempView("edges_t")
    out = eng.run_query(Query("r", CYCLE_UNION), "f.xlsx").collect()
    assert [r["n"] for r in out] == [1, 2]


def test_multi_cte_union_distinct_pointed_error(spark):
    sql = ("WITH RECURSIVE r(x) AS (SELECT 1 UNION SELECT x + 1 FROM r "
           "WHERE x < 3), other AS (SELECT 2) SELECT * FROM r, other")
    assert is_recursive_union(sql)
    with pytest.raises(NotImplementedError, match="recursive_fixpoint"):
        run_recursive_union_sql(spark, sql)
