"""TFRecord and Arrow IPC shard sinks: framing/CRC correctness, round
trips, byte-determinism across partitionings, corrupt-shard
quarantine."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import Row, functions as F

from etl_excel_to_hyper_tableau_spark.sinks.tfrecord import (
    crc32c, frame_record, read_tfrecord, unframe_records, write_tfrecord,
)
from etl_excel_to_hyper_tableau_spark.sinks.arrow_ipc import (
    read_arrow_shards, write_arrow_shards,
)


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------

def test_crc32c_standard_vector():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_frame_round_trip_and_integrity():
    data = b"".join(frame_record(p) for p in (b"a", b"", b"x" * 300))
    assert unframe_records(data) == [b"a", b"", b"x" * 300]
    # flip one payload byte → CRC must catch it
    corrupt = data[:14] + bytes([data[14] ^ 0xFF]) + data[15:]
    with pytest.raises(ValueError):
        unframe_records(corrupt)
    with pytest.raises(ValueError):
        unframe_records(data[:-2])  # truncated


def _docs(spark, n=30):
    return spark.createDataFrame(
        [Row(doc_id=i, payload=json.dumps({"id": i, "text": f"t {i}"}))
         for i in range(n)])


def test_tfrecord_round_trip(spark, tmp_path):
    out = str(tmp_path / "tfr")
    shards = write_tfrecord(_docs(spark), out, "doc_id", "payload",
                            n_shards=4)
    assert shards
    back = read_tfrecord(spark, out).collect()
    assert len(back) == 30
    got = {json.loads(bytes(r["payload"]))["id"] for r in back}
    assert got == set(range(30))
    # in-shard record order is key order
    per = {}
    for r in back:
        per.setdefault(r["shard_file"], []).append(
            (r["record_idx"], json.loads(bytes(r["payload"]))["id"]))
    for rows in per.values():
        ids = [i for _, i in sorted(rows)]
        assert ids == sorted(ids)


def test_tfrecord_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_tfrecord(_docs(spark), a, "doc_id", "payload", n_shards=3)
    write_tfrecord(_docs(spark).repartition(7), b, "doc_id", "payload",
                   n_shards=3)
    for name in sorted(os.listdir(a)):
        ha = hashlib.md5(open(os.path.join(a, name), "rb").read()).digest()
        hb = hashlib.md5(open(os.path.join(b, name), "rb").read()).digest()
        assert ha == hb, name


def test_tfrecord_corrupt_shard_quarantined(spark, tmp_path):
    out = str(tmp_path / "tfr")
    write_tfrecord(_docs(spark, 8), out, "doc_id", "payload", n_shards=1)
    with open(os.path.join(out, "shard-junk.tfrecord"), "wb") as f:
        f.write(b"\x05\x00\x00\x00\x00\x00\x00\x00garbage")
    assert read_tfrecord(spark, out).count() == 8


# ---------------------------------------------------------------------------
# Arrow IPC shards
# ---------------------------------------------------------------------------

def test_arrow_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"text {i}", n=i * 2) for i in range(25)])
    out = str(tmp_path / "arrow")
    shards = write_arrow_shards(df, out, "doc_id", ["text", "n"],
                                n_shards=3)
    assert shards
    back = read_arrow_shards(
        spark, out,
        spark.createDataFrame([], "key long, text string, n long").schema
    ).collect()
    assert len(back) == 25
    by = {r["key"]: (r["text"], r["n"]) for r in back}
    assert by[7] == ("text 7", 14)


def test_arrow_deterministic(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(20)])
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_arrow_shards(df, a, "doc_id", ["text"], n_shards=2)
    write_arrow_shards(df.repartition(5), b, "doc_id", ["text"],
                       n_shards=2)
    for name in sorted(os.listdir(a)):
        ha = hashlib.md5(open(os.path.join(a, name), "rb").read()).digest()
        hb = hashlib.md5(open(os.path.join(b, name), "rb").read()).digest()
        assert ha == hb, name


def test_arrow_corrupt_shard_quarantined(spark, tmp_path):
    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    out = str(tmp_path / "arrow")
    write_arrow_shards(df, out, "doc_id", ["text"], n_shards=1)
    with open(os.path.join(out, "shard-junk.arrow"), "wb") as f:
        f.write(b"not arrow at all")
    back = read_arrow_shards(
        spark, out,
        spark.createDataFrame([], "key long, text string").schema).collect()
    assert len(back) == 1


def test_sink_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        write_tfrecord(_docs(spark, 1), str(tmp_path), "doc_id",
                       "payload", n_shards=0)
    with pytest.raises(ValueError):
        write_arrow_shards(_docs(spark, 1), str(tmp_path), "doc_id",
                           ["payload"], n_shards=0)


# ---------------------------------------------------------------------------
# JSONL shard sink
# ---------------------------------------------------------------------------

def _sha_all(paths):
    return {os.path.basename(p):
            hashlib.sha256(open(p, "rb").read()).hexdigest() for p in paths}


def test_jsonl_shards_round_trip_and_determinism(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.sinks.jsonl import write_jsonl_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}", ["t", str(i)]) for i in range(40)],
        "doc_id long, text string, tags array<string>")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    p1 = write_jsonl_shards(df, d1, "doc_id", n_shards=4)
    # different input partitioning must produce byte-identical shards
    p2 = write_jsonl_shards(df.repartition(7), d2, "doc_id", n_shards=4)
    assert len(p1) == 4 and _sha_all(p1) == _sha_all(p2)
    # round trip: every row back, valid JSON, in-shard id order
    seen = {}
    for p in p1:
        ids = []
        for line in open(p, "rb").read().decode("utf-8").splitlines():
            obj = json.loads(line)
            seen[obj["doc_id"]] = obj
            ids.append(obj["doc_id"])
        assert ids == sorted(ids)
        assert "__shard__" not in obj
    assert len(seen) == 40
    assert seen[7]["text"] == "doc 7" and seen[7]["tags"] == ["t", "7"]


def test_jsonl_shards_gzip_deterministic(spark, tmp_path):
    import gzip

    from etl_excel_to_hyper_tableau_spark.sinks.jsonl import write_jsonl_shards

    df = spark.createDataFrame([(i, "x" * i) for i in range(20)],
                               "doc_id long, text string")
    d1, d2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    p1 = write_jsonl_shards(df, d1, "doc_id", n_shards=2, compress=True)
    p2 = write_jsonl_shards(df.coalesce(1), d2, "doc_id", n_shards=2,
                            compress=True)
    assert _sha_all(p1) == _sha_all(p2)  # pinned gzip mtime
    rows = sum(len(gzip.open(p).read().splitlines()) for p in p1)
    assert rows == 20


def test_jsonl_shards_refuses_binary(spark, tmp_path):
    from etl_excel_to_hyper_tableau_spark.sinks.jsonl import write_jsonl_shards

    df = spark.createDataFrame([(1, bytearray(b"\x00"))],
                               "doc_id long, blob binary")
    with pytest.raises(ValueError, match="binary column"):
        write_jsonl_shards(df, str(tmp_path / "x"), "doc_id")
