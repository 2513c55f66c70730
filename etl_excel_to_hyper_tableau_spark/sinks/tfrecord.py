"""TFRecord shard sink + reader — the second training-loader delivery
format next to WebDataset tars: length-framed records with masked
CRC-32C integrity words, the container tf.data / many JAX input
pipelines stream.

The frame (TensorFlow's record format, public spec in the TF source):

    uint64 LE  length
    uint32 LE  masked_crc32c(length bytes)
    byte[n]    payload
    uint32 LE  masked_crc32c(payload)

with ``mask(c) = ((c >> 15 | c << 17) + 0xa282ead8) mod 2^32``.  The
payload is opaque bytes — TensorFlow ships tf.train.Example protobufs,
but the container is payload-agnostic and this sink writes whatever
bytes column it is given (JSON-encoded samples in the tests; protobuf
encoding belongs to the consumer's schema, not the container).

CRC-32C (Castagnoli, polynomial 0x1EDC6F41 reflected = 0x82F63B78) is
NOT zlib's CRC-32 — the table is built here (stdlib has no crc32c).

Sharding/determinism contract = the WebDataset sink's: hash-routed
shard co-location (one exchange), in-shard key sort, byte-identical
output for the same input under any partitioning.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.sampling import hash_bucket

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), reflected table implementation."""
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def frame_record(payload: bytes) -> bytes:
    """One TFRecord frame around opaque payload bytes."""
    length = struct.pack("<Q", len(payload))
    return (length + struct.pack("<I", _masked_crc(length))
            + payload + struct.pack("<I", _masked_crc(payload)))


def unframe_records(data: bytes) -> list:
    """All payloads of a TFRecord stream; raises ``ValueError`` on a
    truncated frame or a CRC mismatch (integrity is the format's whole
    point — corrupt shards must not pass silently)."""
    out = []
    pos, n = 0, len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated TFRecord length frame")
        length_bytes = data[pos:pos + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (lcrc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        if lcrc != _masked_crc(length_bytes):
            raise ValueError("TFRecord length CRC mismatch")
        end = pos + 12 + length
        if end + 4 > n:
            raise ValueError("truncated TFRecord payload")
        payload = data[pos + 12:end]
        (pcrc,) = struct.unpack("<I", data[end:end + 4])
        if pcrc != _masked_crc(payload):
            raise ValueError("TFRecord payload CRC mismatch")
        out.append(payload)
        pos = end + 4
    return out


def write_tfrecord(df: DataFrame, out_dir: str, id_col: str,
                   payload_col: str, n_shards: int = 8,
                   salt: str = "tfr") -> list:
    """Write ``{out_dir}/shard-{i:05d}.tfrecord``: the payload column
    (binary written raw, string encoded utf-8) framed per record,
    hash-routed to shards, key-sorted within each shard.  Returns the
    shard paths written."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    os.makedirs(out_dir, exist_ok=True)
    routed = (df.select(
        F.col(id_col).cast("long").alias("__key__"),
        (hash_bucket(F.col(id_col), salt) % n_shards).alias("__shard__"),
        F.col(payload_col).alias("__p__"))
        .repartition(n_shards, "__shard__"))

    def write_partition(rows) -> None:
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(int(r["__shard__"]), []).append(r)
        for shard, rs in by_shard.items():
            buf = io.BytesIO()
            for r in sorted(rs, key=lambda x: int(x["__key__"])):
                v = r["__p__"]
                if v is None:
                    continue
                payload = (bytes(v) if isinstance(v, (bytes, bytearray))
                           else str(v).encode("utf-8"))
                buf.write(frame_record(payload))
            path = os.path.join(out_dir, f"shard-{shard:05d}.tfrecord")
            with open(path, "wb") as f:
                f.write(buf.getvalue())

    routed.foreachPartition(write_partition)
    return sorted(
        os.path.join(out_dir, p) for p in os.listdir(out_dir)
        if p.startswith("shard-") and p.endswith(".tfrecord"))


_READ_SCHEMA = T.StructType([
    T.StructField("shard_file", T.StringType(), True),
    T.StructField("record_idx", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), False),
])


def read_tfrecord(spark: SparkSession, path_glob: str) -> DataFrame:
    """Inverse scan: one row per record — ``shard_file, record_idx,
    payload``.  Shards failing CRC/framing are dropped whole
    (quarantine-and-continue; a partially-read corrupt shard would be
    silent data loss)."""
    bf = (spark.read.format("binaryFile").load(path_glob)
          .select("path", "content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, idxs, payloads = [], [], []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    recs = unframe_records(bytes(blob))
                except ValueError:
                    continue
                for i, p in enumerate(recs):
                    paths.append(path)
                    idxs.append(i)
                    payloads.append(p)
            yield pd.DataFrame({
                "shard_file": pd.array(paths, dtype="string"),
                "record_idx": pd.array(idxs, dtype="int64"),
                "payload": payloads,
            })

    return bf.mapInPandas(run, schema=_READ_SCHEMA)
