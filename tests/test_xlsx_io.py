"""The stdlib xlsx reader/writer and the Excel sources (SURVEY A1/A15)."""

import pytest
from pyspark.sql import types as T

from etl_excel_to_hyper_tableau_spark.sources import xlsx_io
from etl_excel_to_hyper_tableau_spark.sources.excel import (
    read_excel_dir_distributed, read_excel_sheet,
)


@pytest.fixture()
def sample_xlsx(tmp_path):
    p = str(tmp_path / "sample.xlsx")
    xlsx_io.write_workbook(p, [
        ("Sheet1",
         ["name", "qty", "price", "ok"],
         [["widget", 3, 1.5, True],
          ["gadget", 7, 2.25, False],
          [None, 1, 0.5, True]]),
        ("Other", ["k"], [["v"]]),
    ])
    return p


def test_roundtrip_values_and_types(sample_xlsx):
    cols, rows = xlsx_io.read_sheet(sample_xlsx, "Sheet1")
    assert cols == ["name", "qty", "price", "ok"]
    assert rows[0] == ["widget", 3, 1.5, True]
    assert rows[2][0] is None
    assert isinstance(rows[0][1], int) and isinstance(rows[0][2], float)


def test_sheet_names_and_index_access(sample_xlsx):
    assert xlsx_io.sheet_names(sample_xlsx) == ["Sheet1", "Other"]
    cols, rows = xlsx_io.read_sheet(sample_xlsx, 1)
    assert cols == ["k"] and rows == [["v"]]


def test_read_from_bytes(sample_xlsx):
    with open(sample_xlsx, "rb") as f:
        raw = f.read()
    cols, _ = xlsx_io.read_sheet(raw, "Sheet1")
    assert cols == ["name", "qty", "price", "ok"]


def test_missing_sheet_raises(sample_xlsx):
    with pytest.raises(KeyError):
        xlsx_io.read_sheet(sample_xlsx, "Nope")


def test_read_excel_sheet_schema_inference(spark, sample_xlsx):
    df = read_excel_sheet(spark, sample_xlsx, "Sheet1")
    types = dict((f.name, type(f.dataType)) for f in df.schema.fields)
    assert types == {"name": T.StringType, "qty": T.LongType,
                     "price": T.DoubleType, "ok": T.BooleanType}
    assert df.count() == 3
    assert df.filter("name IS NULL").count() == 1


def test_distributed_excel_scan(spark, tmp_path):
    # many-files parallelism: binaryFile + mapInPandas (SURVEY §7.4-4)
    for i in range(3):
        xlsx_io.write_workbook(str(tmp_path / f"part{i}.xlsx"),
                               [("Sheet1", ["a", "b"], [[i, f"row{i}"]])])
    schema = T.StructType([T.StructField("a", T.LongType()),
                           T.StructField("b", T.StringType())])
    df = read_excel_dir_distributed(spark, str(tmp_path / "*.xlsx"),
                                    "Sheet1", schema)
    rows = df.collect()
    assert len(rows) == 3
    assert {r["a"] for r in rows} == {0, 1, 2}
    # lineage column present and populated
    assert all(r["source_file"].endswith(".xlsx") for r in rows)
