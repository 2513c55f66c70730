"""Recursive-CTE fixpoint helper and the CSV source / prep utility."""

import pytest
from pyspark.sql import functions as F

from etl_excel_to_hyper_tableau_spark.plans.recursive import recursive_fixpoint
from etl_excel_to_hyper_tableau_spark.sources import xlsx_io
from etl_excel_to_hyper_tableau_spark.sources.csv import csv_to_excel, read_csv


def test_recursive_transitive_closure(spark):
    # reachability over a small DAG: 1→2→3→4, 2→5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5)], "src int, dst int")
    base = edges.selectExpr("src", "dst")

    def step(frontier):
        return (frontier.alias("f")
                .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
                .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst")))

    closure = recursive_fixpoint(base, step)
    got = {tuple(r) for r in closure.collect()}
    assert got == {(1, 2), (2, 3), (3, 4), (2, 5),        # direct
                   (1, 3), (2, 4), (1, 4), (1, 5)}        # derived


def test_recursive_counting_sequence(spark):
    # the classic WITH RECURSIVE counter: 1..10
    base = spark.createDataFrame([(1,)], "n int")

    def step(frontier):
        return frontier.filter(F.col("n") < 10).select((F.col("n") + 1).alias("n"))

    out = recursive_fixpoint(base, step)
    assert sorted(r["n"] for r in out.collect()) == list(range(1, 11))


def test_recursive_guards(spark):
    base = spark.createDataFrame([(1,)], "n int")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        recursive_fixpoint(base, lambda f: f.select((F.col("n") + 1).alias("n")),
                           max_iterations=5)
    with pytest.raises(ValueError, match="schema"):
        recursive_fixpoint(base, lambda f: f.select(F.col("n").cast("long").alias("n")))


def test_csv_roundtrip_and_prep(spark, tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("name,qty\nwidget,3\ngadget,7\nsprocket,1\n")
    df = read_csv(spark, str(csv))
    assert df.columns == ["name", "qty"]
    assert dict(df.dtypes)["qty"] == "int"
    assert df.count() == 3

    out = csv_to_excel(spark, str(csv), str(tmp_path / "out.xlsx"), n_rows=2)
    cols, rows = xlsx_io.read_sheet(out, "Sheet1")
    assert cols == ["name", "qty"]
    assert len(rows) == 2 and rows[0] == ["widget", 3]
