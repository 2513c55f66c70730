"""Tableau Hyper sink (reference A14/A16/A18, query_iterator.py:170-195).

Design differences from the reference:

* schema mapping is a **total** function over Spark types
  (:mod:`..functions.typemap`) — the reference KeyErrors on
  ``datetime64[ns]``/``bool`` (SURVEY §1.3);
* rows move as **Arrow batches**, never a per-row Python loop (the
  reference called ``Inserter.add_row`` once per row,
  query_iterator.py:190-193);
* hyperd is an out-of-process single-node server, so the write is a
  driver-side final-mile step by design; large frames are refused with a
  pointer at the parquet sink.  A fully distributed variant would write
  per-partition ``.hyper`` fragments via ``mapPartitions`` and merge
  with Hyper's ``COPY`` — deliberately out of scope while extracts
  remain small relative to sources (SURVEY §7.4-3).

``tableauhyperapi`` is not installed in this container; the module
degrades to :class:`HyperUnavailableError` at call time while
``plan_hyper_tables`` (the schema-mapping half) stays fully testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.typemap import spark_type_to_sqltype_name

try:  # gated optional dependency
    import tableauhyperapi as _hyper  # noqa: F401
    HYPER_AVAILABLE = True
except ImportError:
    HYPER_AVAILABLE = False


class HyperUnavailableError(RuntimeError):
    pass


def _json_blobs(data: bytes, marker: bytes = b'{"compressionMethod"'):
    """Yield every parseable JSON document starting at ``marker`` in a
    binary blob (brace-balanced scan, quote/escape aware)."""
    import json

    i = 0
    while True:
        start = data.find(marker, i)
        if start == -1:
            return
        depth, j, in_str, esc = 0, start, False, False
        while j < len(data):
            c = data[j]
            if in_str:
                if esc:
                    esc = False
                elif c == 0x5C:  # backslash
                    esc = True
                elif c == 0x22:  # quote
                    in_str = False
            else:
                if c == 0x22:
                    in_str = True
                elif c == 0x7B:  # {
                    depth += 1
                elif c == 0x7D:  # }
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
            j += 1
        try:
            yield json.loads(data[start:j].decode("utf-8", "replace"))
        except ValueError:
            pass
        i = j


def read_hyper_catalog(path: str) -> list[dict]:
    """Read the table catalog embedded in a ``.hyper`` file WITHOUT
    tableauhyperapi: Hyper files carry their catalog as a plain JSON
    document (observed in the reference's golden
    ``complaints_by_bank.hyper``: ``{"compressionMethod": …,
    "relations": [{"name": …, "attributes": [{"name", "type"}…]}…]}``).
    Multiple catalog snapshots may exist (pre/post table creation);
    the one with the most relations — the final state — is returned as
    ``[{"table": name, "columns": [(col_name, [type…])]}]``.

    This is a *read-only golden-file comparator*, not a writer: the
    write path still requires tableauhyperapi (hyperd speaks a
    proprietary protocol); see :func:`write_hyper`.
    """
    with open(path, "rb") as f:
        data = f.read()
    best: list = []
    for doc in _json_blobs(data):
        rels = doc.get("relations", [])
        if len(rels) > len(best):
            best = rels
    return [{"table": r["name"],
             "columns": [(a["name"], a["type"]) for a in r["attributes"]]}
            for r in best]


def plan_hyper_tables(results: list[tuple[str, DataFrame]]) -> list[dict]:
    """Pure planning step: one table plan per query result —
    ``{"table": name, "columns": [(col_name, sqltype_name, nullable)]}``.
    All columns nullable, as the reference's golden output confirms
    (SURVEY §1.3)."""
    plans = []
    for name, df in results:
        cols = [(f.name, spark_type_to_sqltype_name(f.dataType), True)
                for f in df.schema.fields]
        plans.append({"table": name, "columns": cols})
    return plans


def write_hyper(path: str, results: list[tuple[str, DataFrame]],
                max_rows: int = 10_000_000) -> str:
    """Write each result as one table in a single ``.hyper`` file
    (CREATE_AND_REPLACE, like the reference query_iterator.py:173)."""
    if not path.endswith(".hyper"):
        path = path + ".hyper"
    if not HYPER_AVAILABLE:
        raise HyperUnavailableError(
            "tableauhyperapi is not installed; use write_parquet or install "
            "the Tableau Hyper API")

    from tableauhyperapi import (
        Connection, CreateMode, HyperProcess, Inserter, SqlType,
        TableDefinition, Telemetry,
    )
    from ..functions.typemap import spark_type_to_hyper

    with HyperProcess(telemetry=Telemetry.DO_NOT_SEND_USAGE_DATA_TO_TABLEAU) as hp:
        with Connection(endpoint=hp.endpoint, database=path,
                        create_mode=CreateMode.CREATE_AND_REPLACE) as conn:
            for name, df in results:
                table = TableDefinition(name, [
                    TableDefinition.Column(f.name, spark_type_to_hyper(f.dataType))
                    for f in df.schema.fields
                ])
                conn.catalog.create_table(table)
                pdf = df.limit(max_rows + 1).toPandas()  # Arrow batch collect
                if len(pdf) > max_rows:
                    raise ValueError(
                        f"result {name!r} exceeds {max_rows} rows; export to "
                        "parquet instead")
                with Inserter(conn, table) as ins:
                    ins.add_rows(pdf.itertuples(index=False, name=None))
                    ins.execute()
    return path
