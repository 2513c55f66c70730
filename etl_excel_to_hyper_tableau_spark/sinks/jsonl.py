"""JSONL shard sink — the interchange format corpora LEAVE the engine
in (one document object per line: the C4 / Pile / RedPajama shape the
:mod:`..sources.jsonl` reader ingests; this sink closes the loop so a
curation run can emit exactly what the next pipeline stage reads).

Spark's own ``df.write.json`` writes one file per partition with
engine-chosen names and row order — fine for Spark-to-Spark, wrong for
a published corpus drop, where shard membership and bytes must be
reproducible run-over-run.  This sink applies the repo's loader-format
contract (the WebDataset/TFRecord doctrine):

* **hash-routed shards** — every row goes to
  ``shard-{bucket:05d}.jsonl[.gz]`` by the deterministic md5 bucket of
  its id (same row → same shard under ANY input partitioning);
* **in-shard order** — rows sort by id inside the shard;
* **byte determinism** — canonical JSON encoding (sorted keys, compact
  separators, ``ensure_ascii``), ``\\n`` line ends; gzip (when on)
  writes a pinned-mtime member so compressed shards are also
  byte-identical across runs;
* **one hash exchange** routes rows to shards (co-location: several
  shards may share a task, each writes its own file — no task writes a
  shard partially); no driver funnel.

Scale note: a shard's rows must fit one executor's memory during the
in-shard sort — pick ``n_shards`` so corpus/n_shards is a few hundred
MB, the same sizing rule every shard producer follows.
"""

from __future__ import annotations

import gzip
import io
import json
import os

from pyspark.sql import DataFrame, functions as F

from ..operators.sampling import hash_bucket


def _encode_rows(rows: list, cols: list[str]) -> bytes:
    out = io.BytesIO()
    for r in rows:
        obj = {c: r[c] for c in cols}
        out.write(json.dumps(obj, sort_keys=True,
                             separators=(",", ":"),
                             ensure_ascii=True).encode("utf-8"))
        out.write(b"\n")
    return out.getvalue()


def write_jsonl_shards(df: DataFrame, out_dir: str, id_col: str,
                       n_shards: int = 8, compress: bool = False,
                       salt: str = "jsonl") -> list[str]:
    """Write ``df`` as ``{out_dir}/shard-{i:05d}.jsonl`` (``.jsonl.gz``
    when ``compress``); one JSON object per row over the DataFrame's
    visible columns.  Returns the shard paths written (absent shards —
    possible when rows < shards — are simply not created).

    Values must be JSON-encodable (strings/numbers/bools/arrays/
    structs arrive from Spark as python primitives/Rows — Rows are
    converted to dicts).  Binary columns are refused: JSONL is a text
    interchange; route media through the WebDataset/TFRecord sinks.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql.types import BinaryType

    for f in df.schema.fields:
        if isinstance(f.dataType, BinaryType):
            raise ValueError(
                f"binary column {f.name!r}: JSONL is text interchange — "
                "use the WebDataset or TFRecord sink for media bytes")
    os.makedirs(out_dir, exist_ok=True)
    cols = df.columns
    routed = (df.withColumn(
        "__shard__", hash_bucket(F.col(id_col), salt) % n_shards)
        .repartition(n_shards, "__shard__"))
    suffix = ".jsonl.gz" if compress else ".jsonl"

    def write_partition(rows) -> None:
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(int(r["__shard__"]), []).append(r)
        for shard, rs in by_shard.items():
            rs.sort(key=lambda x: x[id_col])
            dicts = [r.asDict(recursive=True) for r in rs]
            payload = _encode_rows(dicts, cols)
            if compress:
                buf = io.BytesIO()
                # mtime pinned: gzip embeds a timestamp by default,
                # which would break byte determinism run-over-run
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(payload)
                payload = buf.getvalue()
            path = os.path.join(out_dir, f"shard-{shard:05d}{suffix}")
            with open(path, "wb") as f:
                f.write(payload)

    routed.foreachPartition(write_partition)
    return sorted(
        os.path.join(out_dir, p) for p in os.listdir(out_dir)
        if p.startswith("shard-") and p.endswith(suffix))
