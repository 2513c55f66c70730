"""WebDataset tar-shard sink + reader — the delivery format
large-scale training jobs stream (one ``.tar`` per shard, each sample
a group of same-prefix member files: ``000000042.txt``,
``000000042.json``, …), consumed sequentially by data loaders.

The reference engine's sinks are Excel/Hyper (its §2A surface); this
sink is part of the LLM-pipeline extension: after packing/sharding
(:mod:`..operators.packing`), a training corpus LEAVES the engine as
WebDataset shards.

Scale + determinism contract:

* ``write_webdataset`` routes every row to its shard with one hash
  exchange (rows of a shard are co-located; several shards may share a
  task and each writes its own tar — no task writes a shard
  partially), sorts samples within the shard by key, and emits
  byte-deterministic tars (pinned mtime/uid/gid/mode, USTAR format) —
  same input ⇒ byte-identical shards, the reproducibility bar every
  artifact in this repo meets.
* ``read_webdataset`` is the inverse scan: ``binaryFile`` + stdlib
  ``tarfile`` inside ``mapInPandas``, one row per member file —
  map-only, per-shard parallelism (exactly how training loaders
  consume the format).

Stdlib only (``tarfile``/``io``).  Format reference: the WebDataset
convention (Breuel et al.) — tar members grouped by dot-split prefix.

Deployment note: ``foreachPartition`` writes with ``open()`` on the
executor's filesystem — in local mode that is the local disk; on a
cluster point ``out_dir`` at a shared mount (NFS/FUSE), the standard
arrangement for tar-shard producers (the format itself is
object-store-friendly: one sequential PUT per shard).
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..operators.sampling import hash_bucket


def _tar_bytes(samples: list) -> bytes:
    """Deterministic tar of ``(member_name, payload bytes)`` pairs."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in samples:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_webdataset(df: DataFrame, out_dir: str, id_col: str,
                     members: dict, n_shards: int = 8,
                     salt: str = "wds") -> list:
    """Write ``df`` as ``{out_dir}/shard-{i:05d}.tar``.

    ``members``: ``{extension: column}`` — each row becomes one sample
    whose member files are ``{key:09d}.{ext}`` (string columns encoded
    utf-8, binary written raw, everything else ``str()``-encoded).
    Shard routing is the deterministic hash bucket (same row → same
    shard on every run/partitioning); samples sort by key inside the
    shard.  Returns the shard paths written (absent shards — possible
    when rows < shards — are simply not created).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    os.makedirs(out_dir, exist_ok=True)
    exts = sorted(members)
    cols = [F.col(id_col).cast("long").alias("__key__"),
            (hash_bucket(F.col(id_col), salt) % n_shards).alias("__shard__")]
    cols += [F.col(members[e]).alias(f"__m_{e}__") for e in exts]
    routed = df.select(*cols).repartition(n_shards, "__shard__")

    def write_partition(rows) -> None:
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(int(r["__shard__"]), []).append(r)
        for shard, rs in by_shard.items():
            samples = []
            for r in sorted(rs, key=lambda x: int(x["__key__"])):
                key = f"{int(r['__key__']):09d}"
                for e in exts:
                    v = r[f"__m_{e}__"]
                    if v is None:
                        continue
                    if isinstance(v, (bytes, bytearray)):
                        payload = bytes(v)
                    elif isinstance(v, str):
                        payload = v.encode("utf-8")
                    else:
                        payload = str(v).encode("utf-8")
                    samples.append((f"{key}.{e}", payload))
            path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
            data = _tar_bytes(samples)
            with open(path, "wb") as f:
                f.write(data)

    routed.foreachPartition(write_partition)
    return sorted(
        os.path.join(out_dir, p) for p in os.listdir(out_dir)
        if p.startswith("shard-") and p.endswith(".tar"))


_READ_SCHEMA = T.StructType([
    T.StructField("shard_file", T.StringType(), True),
    T.StructField("key", T.StringType(), False),
    T.StructField("ext", T.StringType(), False),
    T.StructField("content", T.BinaryType(), False),
])


def read_webdataset(spark: SparkSession, path_glob: str) -> DataFrame:
    """Inverse scan: one row per member file —
    ``shard_file, key (dot-split prefix), ext, content``.  Unreadable
    tars are dropped (quarantine-and-continue)."""
    bf = (spark.read.format("binaryFile").load(path_glob)
          .select("path", "content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, keys, exts_, blobs = [], [], [], []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                        for info in tf:
                            if not info.isfile():
                                continue
                            key, _, ext = info.name.partition(".")
                            paths.append(path)
                            keys.append(key)
                            exts_.append(ext)
                            blobs.append(tf.extractfile(info).read())
                except (tarfile.TarError, OSError):
                    continue
            yield pd.DataFrame({
                "shard_file": pd.array(paths, dtype="string"),
                "key": pd.array(keys, dtype="string"),
                "ext": pd.array(exts_, dtype="string"),
                "content": blobs,
            })

    return bf.mapInPandas(run, schema=_READ_SCHEMA)
