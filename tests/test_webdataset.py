"""WebDataset sink/reader: round trip, byte-determinism, stable shard
routing, member handling (binary/string/None), reader quarantine."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import Row, functions as F

from etl_excel_to_hyper_tableau_spark.sinks.webdataset import (
    read_webdataset, write_webdataset,
)


def _docs(spark, n=40):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"text {i}", meta=f'{{"id": {i}}}',
             blob=bytes([i % 256, 255 - i % 256]))
         for i in range(n)])


def test_round_trip(spark, tmp_path):
    df = _docs(spark)
    out = str(tmp_path / "wds")
    shards = write_webdataset(df, out, "doc_id",
                              {"txt": "text", "json": "meta", "bin": "blob"},
                              n_shards=4)
    assert shards and all(os.path.exists(p) for p in shards)
    back = read_webdataset(spark, out).collect()
    assert len(back) == 40 * 3
    by = {(r["key"], r["ext"]): bytes(r["content"]) for r in back}
    assert by[("000000007", "txt")] == b"text 7"
    assert by[("000000007", "json")] == b'{"id": 7}'
    assert by[("000000007", "bin")] == bytes([7, 248])


def test_byte_deterministic(spark, tmp_path):
    df = _docs(spark, 25)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(df, a, "doc_id", {"txt": "text"}, n_shards=3)
    # second write from a differently-partitioned copy of the same data
    write_webdataset(df.repartition(7), b, "doc_id", {"txt": "text"},
                     n_shards=3)
    for name in sorted(os.listdir(a)):
        ha = hashlib.md5(open(os.path.join(a, name), "rb").read()).hexdigest()
        hb = hashlib.md5(open(os.path.join(b, name), "rb").read()).hexdigest()
        assert ha == hb, name
    assert sorted(os.listdir(a)) == sorted(os.listdir(b))


def test_samples_grouped_and_sorted_within_shard(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(_docs(spark), out, "doc_id",
                     {"txt": "text", "json": "meta"}, n_shards=2)
    rows = read_webdataset(spark, out).collect()
    per_shard: dict = {}
    for r in rows:
        per_shard.setdefault(r["shard_file"], []).append(
            (r["key"], r["ext"]))
    for members in per_shard.values():
        keys = [k for k, _ in members]
        assert keys == sorted(keys)  # tar order = key order
        # both members of a sample are adjacent
        for i in range(0, len(members), 2):
            assert members[i][0] == members[i + 1][0]


def test_none_member_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a", meta=None), Row(doc_id=2, text="b",
                                                 meta="m")])
    out = str(tmp_path / "wds")
    write_webdataset(df, out, "doc_id", {"txt": "text", "json": "meta"},
                     n_shards=1)
    back = read_webdataset(spark, out).collect()
    assert {(r["key"], r["ext"]) for r in back} == {
        ("000000001", "txt"), ("000000002", "txt"), ("000000002", "json")}


def test_reader_quarantines_junk(spark, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(_docs(spark, 5), out, "doc_id", {"txt": "text"},
                     n_shards=1)
    with open(os.path.join(out, "shard-junk.tar"), "wb") as f:
        f.write(b"definitely not a tar file")
    back = read_webdataset(spark, out).collect()
    assert len(back) == 5


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        write_webdataset(_docs(spark, 1), str(tmp_path), "doc_id",
                         {"txt": "text"}, n_shards=0)
