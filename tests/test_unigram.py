"""Unigram-LM tokenizer: Viterbi semantics (tie rules, unk coverage),
train determinism, segmentation losslessness, and the map-only apply
plan contract."""

from __future__ import annotations

from pyspark.sql import Row

from etl_excel_to_hyper_tableau_spark.operators.text import (
    _unigram_viterbi, unigram_apply, unigram_train,
)


# ---------------------------------------------------------------------------
# _unigram_viterbi — pure-function semantics
# ---------------------------------------------------------------------------

def test_viterbi_prefers_high_probability_split():
    # "ab" as one piece beats "a"+"b" when its logp exceeds the sum
    lp = {"a": -2.0, "b": -2.0, "ab": -1.0}
    assert _unigram_viterbi("ab", lp, 2, -20.0) == ["ab"]
    lp = {"a": -1.0, "b": -1.0, "ab": -3.0}
    assert _unigram_viterbi("ab", lp, 2, -20.0) == ["a", "b"]


def test_viterbi_tie_prefers_longer_final_piece():
    # exact score tie: ["ab"] vs ["a","b"] at -2.0 — longer piece wins
    lp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert _unigram_viterbi("ab", lp, 2, -20.0) == ["ab"]


def test_viterbi_unk_single_chars_cover():
    lp = {"a": -1.0}
    assert _unigram_viterbi("axa", lp, 2, -9.0) == ["a", "x", "a"]
    # a fully-unknown word still segments (char per char)
    assert _unigram_viterbi("zzz", lp, 2, -9.0) == ["z", "z", "z"]


def test_viterbi_empty_word():
    assert _unigram_viterbi("", {"a": -1.0}, 2, -9.0) == []


# ---------------------------------------------------------------------------
# train + apply on Spark
# ---------------------------------------------------------------------------

def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_train_learns_frequent_pieces(spark):
    # "abab" dominates: the piece 'ab' must enter the vocab and win
    df = _docs(spark, ["abab abab abab", "abab cd", "cd cd"])
    vocab = unigram_train(df, "text", vocab_size=8, max_piece_len=2,
                          iters=2)
    pieces = dict(vocab)
    assert "ab" in pieces
    out = unigram_apply(df, "text", "doc_id", vocab).orderBy("id").collect()
    assert out[0]["tokens"][:2] == ["ab", "ab"]
    # coverage: single chars persist even when longer pieces win
    assert {"a", "b", "c", "d"} <= set(pieces)


def test_apply_is_lossless(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    vocab = unigram_train(docs, "text", vocab_size=64, max_piece_len=3,
                          iters=1)
    out = unigram_apply(docs, "text", "doc_id", vocab).collect()
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(out) == 50
    for r in out:
        assert "".join(r["tokens"]) == "".join(src[r["id"]].split())
        assert r["n_tokens"] == len(r["tokens"])
        assert r["n_words"] == len(src[r["id"]].split())


def test_train_deterministic(spark):
    df = _docs(spark, ["foo bar baz", "bar bar foo", "baz qux"])
    v1 = unigram_train(df, "text", vocab_size=16, max_piece_len=3, iters=2)
    v2 = unigram_train(df, "text", vocab_size=16, max_piece_len=3, iters=2)
    assert v1 == v2


def test_unknown_chars_at_apply(spark):
    train = _docs(spark, ["aa bb aa"])
    vocab = unigram_train(train, "text", vocab_size=8, max_piece_len=2,
                          iters=1)
    new = _docs(spark, ["aa zz"])
    out = unigram_apply(new, "text", "doc_id", vocab).collect()
    assert "".join(out[0]["tokens"]) == "aazz"


def test_apply_plan_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = [("a", -1.0), ("ab", -1.5)]
    plan = (unigram_apply(docs, "text", "doc_id", vocab)
            ._jdf.queryExecution().executedPlan().toString())
    # spread()'s round-robin repartition (parallelism on few input
    # splits) is allowed; a KEYED shuffle is not — tokenization must
    # never exchange on data values
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert plan.count("MapInPandas") == 1
