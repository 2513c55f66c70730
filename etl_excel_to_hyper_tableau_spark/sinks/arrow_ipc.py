"""Arrow IPC (Feather V2) shard sink + reader — the third
training-loader delivery format: memory-mappable columnar shards, the
on-disk layout HuggingFace ``datasets`` and Ray Data consume
zero-copy.  pyarrow ships in this container (it already powers every
``mapInPandas`` boundary), so the files are REAL Arrow IPC, not a
stand-in.

Sharding/determinism contract = the WebDataset/TFRecord sinks': one
hash exchange routes rows to shards (co-location — no shard is
written by two tasks), rows sort by key within the shard, and the
writer pins every nondeterminism source (no compression-level
ambiguity: uncompressed IPC; fixed schema order) so the same input
yields byte-identical shards under any partitioning.

Scale shape: the write is ``foreachPartition`` streaming one
RecordBatch per shard — shard memory is bounded by the shard's rows
(size shards accordingly, the same contract as any columnar writer);
the read back is ``binaryFile`` + zero-copy ``pa.ipc.open_file``.
"""

from __future__ import annotations

import io
import os
from typing import Iterator

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.sampling import hash_bucket


def write_arrow_shards(df: DataFrame, out_dir: str, id_col: str,
                       columns: list, n_shards: int = 8,
                       salt: str = "arrow") -> list:
    """Write ``{out_dir}/shard-{i:05d}.arrow`` (Arrow IPC file format):
    ``columns`` of ``df`` plus the routing key, one file per shard,
    rows key-sorted.  Returns the shard paths written."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    os.makedirs(out_dir, exist_ok=True)
    routed = (df.select(
        F.col(id_col).cast("long").alias("__key__"),
        (hash_bucket(F.col(id_col), salt) % n_shards).alias("__shard__"),
        *[F.col(c) for c in columns])
        .repartition(n_shards, "__shard__"))

    def write_partition(rows) -> None:
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(int(r["__shard__"]), []).append(r)
        for shard, rs in by_shard.items():
            rs.sort(key=lambda x: int(x["__key__"]))
            data = {"key": [int(r["__key__"]) for r in rs]}
            for c in columns:
                data[c] = [r[c] for r in rs]
            table = pa.table(data)
            buf = io.BytesIO()
            with pa.ipc.new_file(buf, table.schema) as w:
                w.write_table(table)
            path = os.path.join(out_dir, f"shard-{shard:05d}.arrow")
            with open(path, "wb") as f:
                f.write(buf.getvalue())

    routed.foreachPartition(write_partition)
    return sorted(
        os.path.join(out_dir, p) for p in os.listdir(out_dir)
        if p.startswith("shard-") and p.endswith(".arrow"))


def read_arrow_shards(spark: SparkSession, path_glob: str,
                      schema: T.StructType) -> DataFrame:
    """Inverse scan: ``binaryFile`` + ``pa.ipc.open_file`` per shard;
    ``schema`` declares the expected columns (a ``shard_file`` lineage
    column is appended).  Unreadable shards are dropped."""
    out_fields = list(schema.fields) + [
        T.StructField("shard_file", T.StringType(), True)]
    out_schema = T.StructType(out_fields)
    names = [f.name for f in schema.fields]
    bf = (spark.read.format("binaryFile").load(path_glob)
          .select("path", "content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    table = pa.ipc.open_file(
                        pa.BufferReader(bytes(blob))).read_all()
                except (pa.ArrowInvalid, OSError):
                    continue
                f = table.select(names).to_pandas()
                f["shard_file"] = path
                frames.append(f)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return bf.mapInPandas(run, schema=out_schema)
