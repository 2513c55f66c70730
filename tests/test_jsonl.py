"""JSONL corpus source: schema-explicit PERMISSIVE ingestion, corrupt
quarantine, canonical documents shape, round trip."""

from __future__ import annotations

import os

from etl_excel_to_hyper_tableau_spark.sources.jsonl import (
    read_documents_jsonl, read_jsonl, split_corrupt, write_jsonl,
)

LINES = [
    '{"id": 1, "text": "the quick brown fox", "lang": "en"}',
    '{"id": 2, "text": "der schnelle braune fuchs", "lang": "de"}',
    'this is not json at all',
    '{"id": 4, "text": "unterminated',
    '{"id": 5, "text": "fine again", "lang": "en"}',
]


def _corpus(tmp_path):
    p = str(tmp_path / "corpus.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(LINES))
    return p


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    df = read_jsonl(spark, _corpus(tmp_path), "id long, text string, lang string")
    good, bad = split_corrupt(df)
    assert {r["id"] for r in good.collect()} == {1, 2, 5}
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 2
    assert "not json" in raws[0] or "not json" in raws[1]
    assert "_corrupt_record" not in good.columns


def test_read_documents_canonical_shape(spark, tmp_path):
    docs, bad = read_documents_jsonl(
        spark, _corpus(tmp_path), extra_fields={"lang": "string"})
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {1, 2, 5}
    assert rows[1]["n_chars"] == len("the quick brown fox")
    assert rows[2]["lang"] == "de"
    assert rows[1]["source"].endswith("corpus.jsonl")
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert bad.count() == 2


def test_content_hash_ids_when_no_id_field(spark, tmp_path):
    docs, _ = read_documents_jsonl(spark, _corpus(tmp_path), id_field=None)
    ids = {r["text"]: r["doc_id"] for r in docs.collect()}
    again, _ = read_documents_jsonl(spark, _corpus(tmp_path), id_field=None)
    assert {r["text"]: r["doc_id"] for r in again.collect()} == ids
    assert len(set(ids.values())) == 3  # distinct texts → distinct ids


def test_jsonl_round_trip(spark, tmp_path):
    docs, _ = read_documents_jsonl(
        spark, _corpus(tmp_path), extra_fields={"lang": "string"})
    out = str(tmp_path / "out")
    write_jsonl(docs.drop("source"), out, partitions=2)
    assert len([f for f in os.listdir(out) if f.startswith("part-")]) == 2
    back = read_jsonl(spark, out, "doc_id long, text string, lang string, n_chars long")
    good, bad = split_corrupt(back)
    assert bad.count() == 0
    orig = {(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()}
    assert {(r["doc_id"], r["text"], r["lang"]) for r in good.collect()} == orig
