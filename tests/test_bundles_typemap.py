"""Config objects (SURVEY A19/A20 quirks fixed) and the total
Spark→Hyper type map (§1.3 KeyError hole fixed)."""

import pytest
from pyspark.sql import types as T

from etl_excel_to_hyper_tableau_spark.bundles import Query, QueryBundle
from etl_excel_to_hyper_tableau_spark.functions.typemap import (
    spark_type_to_sqltype_name,
)


def test_scalar_coercion():
    b = QueryBundle(export_name="e", sink="hyper", matches="one.xlsx",
                    sheets="Sheet1", queries=Query("q", "SELECT 1"))
    assert b.matches == ["one.xlsx"] and b.sheets == ["Sheet1"]
    assert len(b.queries) == 1


def test_sink_equality_dispatch_not_substring():
    # reference: `file_extension in '.hyper'` matched '', '.h', 'er'
    # (query_iterator.py:46) — rebuilt as equality on normalized ext
    with pytest.raises(ValueError):
        QueryBundle(export_name="e", sink="er")
    with pytest.raises(ValueError):
        QueryBundle(export_name="e", sink="")
    assert QueryBundle(export_name="e", sink=".HYPER").sink == "hyper"


def test_pivot_flags_keyed_by_name_not_order():
    # reference zipped pivot_table.values() positionally (query_bundle.py:56)
    b = QueryBundle.from_strings(
        export_name="e", sink="excel", matches=[], sheets=[],
        query_strings=["SELECT 1", "SELECT 2"], query_names=["a", "b"],
        pivot_by_name={"b": True})  # order-independent
    flags = {q.name: q.pivot for q in b.queries}
    assert flags == {"a": False, "b": True}


def test_duplicate_query_names_rejected():
    with pytest.raises(ValueError):
        QueryBundle(export_name="e", sink="excel",
                    queries=[Query("q", "SELECT 1"), Query("q", "SELECT 2")])


def test_typemap_is_total():
    # every Spark type maps; nothing KeyErrors (reference broke on
    # datetime64[ns] and bool, query_iterator.py:217-227)
    cases = {
        T.LongType(): "big_int", T.IntegerType(): "int",
        T.ShortType(): "int", T.ByteType(): "int",
        T.DoubleType(): "double", T.FloatType(): "double",
        T.TimestampType(): "timestamp", T.DateType(): "date",
        T.BooleanType(): "bool", T.BinaryType(): "bytes",
        T.StringType(): "text", T.NullType(): "text",
        T.ArrayType(T.IntegerType()): "text",
        T.MapType(T.StringType(), T.IntegerType()): "text",
        T.StructType([T.StructField("x", T.IntegerType())]): "text",
    }
    for dt, expected in cases.items():
        assert spark_type_to_sqltype_name(dt) == expected, dt
    assert spark_type_to_sqltype_name(T.DecimalType(12, 2)) == "numeric(12,2)"
