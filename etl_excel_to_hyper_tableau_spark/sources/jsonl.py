"""Line-delimited JSON (JSONL) corpus source.

Web-scale text corpora ship as JSONL (one document object per line —
the C4 / Pile / RedPajama interchange shape), and at 100 TB the reader
contract matters more than the parse: an explicit schema (no inference
job over the whole corpus), malformed lines quarantined instead of
failing the job or silently vanishing, and a projection to the
engine's canonical ``documents`` shape so every downstream operator
(dedup, quality, sampling) composes unchanged.

Spark's JSON datasource does the heavy lifting (distributed,
splittable for uncompressed files, predicate/column pruning through
the parse); this module pins the corpus-ingestion policy around it:

* ``read_jsonl`` — schema-explicit PERMISSIVE read with a corrupt-
  record capture column.
* ``split_corrupt`` — (good, quarantine) pair; the quarantine keeps
  the raw line for repair-and-replay.
* ``read_documents_jsonl`` — canonical-shape ingestion: casts, id
  fallback (content hash when the corpus has no id field), byte/char
  accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from ..functions.hashing import md5_int64

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | str) -> DataFrame:
    """Read JSONL with an explicit schema (never schema inference — at
    corpus scale inference is a full extra pass): malformed lines
    produce a row whose ``_corrupt_record`` column holds the raw line
    and whose data columns are NULL.

    Implementation: text scan + ``from_json`` rather than the native
    JSON datasource.  The native source forbids lazily querying its
    corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN — the documented workaround is caching the corpus,
    a non-starter at 100 TB); ``from_json`` populates the same capture
    column as an ordinary expression, so the quarantine split below
    stays a narrow, cache-free filter.  Text scans are splittable for
    uncompressed/zstd files, and the parse runs inside codegen.

    ``schema`` may be a DDL string (``"id long, text string"``); the
    corrupt-capture column is appended automatically.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, "string")
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    return (spark.read.text(path)
            .filter(F.trim("value") != "")  # JSONL allows blank lines
            .select(F.from_json(F.col("value"), schema, opts).alias("__j__"))
            .select("__j__.*"))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows lose the capture column; the
    quarantine keeps only the raw line for repair-and-replay.  Both are
    narrow filters over the same text scan — no shuffle, no caching.
    """
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = (df.filter(F.col(CORRUPT_COL).isNotNull())
           .select(F.col(CORRUPT_COL).alias("raw_line")))
    return good, bad


def read_documents_jsonl(spark: SparkSession, path: str,
                         text_field: str = "text",
                         id_field: str | None = "id",
                         extra_fields: dict[str, str] | None = None,
                         ) -> tuple[DataFrame, DataFrame]:
    """Ingest a JSONL corpus into the engine's canonical ``documents``
    shape: ``doc_id bigint, text string, source string, n_chars
    bigint`` (+ any ``extra_fields`` name→DDL-type, e.g.
    ``{"lang": "string"}``).

    When the corpus has no id field (``id_field=None``) a deterministic
    content-hash id is derived (md5 of the text, 60-bit) — stable
    across re-runs and partitionings, with the usual caveat that exact
    duplicate texts collide (which downstream exact-dedup treats as
    the same document anyway).  Returns (documents, quarantine).

    Structurally valid lines *missing* the text field are not corrupt —
    they pass through with NULL text (and NULL doc_id under the
    content-hash fallback); gate them downstream with the cleaning
    operators, which is where empty-document policy belongs.
    """
    extra = extra_fields or {}
    fields = [f"{text_field} string"]
    if id_field:
        fields.append(f"{id_field} bigint")
    fields += [f"{name} {ddl}" for name, ddl in extra.items()]
    raw = read_jsonl(spark, path, ", ".join(fields))
    good, bad = split_corrupt(raw)
    doc_id = (F.col(id_field).cast("long") if id_field
              else md5_int64(F.col(text_field)))
    out = good.select(
        doc_id.alias("doc_id"),
        F.col(text_field).cast("string").alias("text"),
        *[F.col(name) for name in extra],
        F.input_file_name().alias("source"),
        F.length(text_field).cast("long").alias("n_chars"))
    return out, bad


def write_jsonl(df: DataFrame, path: str, compression: str | None = None,
                partitions: int | None = None) -> None:
    """Write a corpus back out as JSONL (sharded directory — the only
    layout that parallelizes at scale).  ``compression`` e.g. 'gzip'
    (note: gzip shards are non-splittable on re-read; prefer none or
    zstd for corpora that will be re-processed)."""
    if partitions:
        df = df.repartition(partitions)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
