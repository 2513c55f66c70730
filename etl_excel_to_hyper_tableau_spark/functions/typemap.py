"""Total Spark-type → sink-type mapping.

The reference mapped pandas dtype *names* to Hyper SqlTypes with a
partial dict (query_iterator.py:217-227) that KeyErrors on
``datetime64[ns]``, ``bool`` and every other unlisted dtype (SURVEY
§1.3).  The rebuild implements the evident intent as a **total**
function over Spark types: int→int, float→double, datetime→timestamp,
everything else→text, plus the types the reference never saw (date,
bool, decimal) mapped to their natural Hyper counterparts.
"""

from __future__ import annotations

from pyspark.sql import types as T


def spark_type_to_sqltype_name(dt: T.DataType) -> str:
    """Spark type → Hyper SqlType constructor name (string form, usable
    without tableauhyperapi installed)."""
    if isinstance(dt, (T.LongType,)):
        return "big_int"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "double"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    # strings, arrays, maps, structs → text (complex types JSON-serialized
    # at the sink boundary)
    return "text"


def spark_type_to_hyper(dt: T.DataType):
    """Spark type → live ``tableauhyperapi.SqlType`` (requires the lib)."""
    from tableauhyperapi import SqlType  # gated import

    name = spark_type_to_sqltype_name(dt)
    if name.startswith("numeric"):
        d = dt  # DecimalType
        return SqlType.numeric(d.precision, d.scale)
    return {
        "big_int": SqlType.big_int, "int": SqlType.int,
        "double": SqlType.double, "timestamp": SqlType.timestamp,
        "date": SqlType.date, "bool": SqlType.bool,
        "bytes": SqlType.bytes, "text": SqlType.text,
    }[name]()
