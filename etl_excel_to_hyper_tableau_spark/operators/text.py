"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is a Catalyst expression over string/array built-ins (JVM
codegen; no Python UDFs), and every formula is simple integer/double
arithmetic so an external SQL oracle can reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .parallelism import spread
from ..functions.hashing import md5_int64

# Tiny public stopword lists (top function words). Deliberately short —
# this is an n-gram/stopword *heuristic* language ID, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "del", "por"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}

_TOKEN_SPLIT = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (``split`` keeps a trailing
    empty string on trailing whitespace — filter it so counts match an
    oracle's regexp splitter)."""
    return F.filter(F.split(F.trim(col), _TOKEN_SPLIT), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish sub-token estimate: word characters grouped in runs of ≤4
    plus standalone non-word glyphs — a deterministic proxy for tokenizer
    counts when no tokenizer library is available (≈ chars/4 for prose)."""
    word_chars = F.length(F.regexp_replace(col, r"[^A-Za-z0-9]", ""))
    other = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return (F.ceil(word_chars / F.lit(4.0)) + other).cast("long")


def _stopword_hits(toks: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def language_scores(col: Column) -> Column:
    """Struct of per-language stopword-hit ratios."""
    toks = tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    return F.struct(*[
        (_stopword_hits(toks, lang).cast("double") / n).alias(lang)
        for lang in STOPWORDS
    ])


def detect_language(col: Column, min_ratio: float = 0.05) -> Column:
    """argmax over language_scores; 'und' (undetermined) when the best
    ratio is below ``min_ratio``.  Deterministic tie-break: language
    list order (en, es, de, fr)."""
    scores = language_scores(col)
    langs = list(STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best >= min_ratio, out).otherwise(F.lit("und"))


def quality_features(col: Column) -> Column:
    """Struct of deterministic quality signals:

    * ``n_chars``, ``n_tokens``
    * ``mean_token_len`` — chars-in-tokens / tokens
    * ``punct_ratio`` — non-alnum-non-space chars / chars
    * ``stopword_ratio`` — English stopword hits / tokens
    * ``upper_ratio`` — uppercase / alphabetic chars
    * ``digit_ratio`` — digits / chars
    """
    toks = tokens(col)
    n_chars = F.length(col)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    upper = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    digits = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.struct(
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (tok_chars / safe_tokens).alias("mean_token_len"),
        (punct / safe_chars).alias("punct_ratio"),
        (_stopword_hits(toks, "en").cast("double") / safe_tokens).alias("stopword_ratio"),
        (upper / F.greatest(alpha, F.lit(1)).cast("double")).alias("upper_ratio"),
        (digits / safe_chars).alias("digit_ratio"),
    )


def quality_score(col: Column) -> Column:
    """Scalar [0,1] quality score: linear blend of the features with
    fixed public weights (length sweet-spot, low punctuation, presence
    of stopwords — the classic heuristic trio)."""
    f = quality_features(col)
    length_score = F.least(f["n_tokens"].cast("double") / F.lit(20.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(1.0) - f["punct_ratio"] * 4.0, F.lit(0.0))
    stop_score = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    return (length_score * 0.4 + punct_score * 0.3 + stop_score * 0.3)


def fingerprint64(col: Column) -> Column:
    """Order-sensitive 64-bit document fingerprint: left-fold polynomial
    rolling hash over *token* md5 hashes, mod 2^61-1.

    ``h := (h * 1000003 + md5_31(tok)) mod M61`` — all int64-exact
    (h < 2^61, multiplier < 2^20 ⟹ product < 2^81... kept safe by
    reducing h to 41 bits before the multiply).  Portable to any
    engine with 64-bit ints and md5.
    """
    m61 = (1 << 61) - 1
    toks = tokens(col)
    tok_h = F.transform(toks, lambda t: md5_int64(t) % F.lit(1 << 31))
    return F.aggregate(
        tok_h,
        F.lit(0).cast("long"),
        lambda acc, h: ((acc % F.lit(1 << 41)) * F.lit(1000003) + h) % F.lit(m61),
    )


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-stop per-document profile: language, quality, token counts,
    fingerprint — narrow projections; the only possible shuffle is the
    :func:`spread` parallelism guard on under-partitioned inputs.

    The token array and its per-language stopword hit counts are
    materialized in their own projections so the downstream features
    share them: inlined, each feature expression would re-evaluate the
    split and the stopword scans (Catalyst does not CSE across
    higher-order-function subtrees), measured ~35% slower at sf0.1."""
    c = F.col(text_col)
    base = spread(df).select(F.col(id_col).alias("id"), c.alias("__t__"),
                             tokens(c).alias("__toks__"))
    toks = F.col("__toks__")
    t = F.col("__t__")
    n_tok = F.size(toks)
    hits = base.select(
        "id", "__t__", "__toks__", n_tok.alias("__n__"),
        *[_stopword_hits(toks, lang).alias(f"__hit_{lang}__") for lang in STOPWORDS])

    # language: argmax of per-language hit ratios (ratios share one
    # denominator, so compare hit counts directly); 'und' under min_ratio
    n_safe = F.greatest(F.col("__n__"), F.lit(1))
    best = F.greatest(*[F.col(f"__hit_{lang}__") for lang in STOPWORDS])
    lang_out = F.lit("und")
    for lang in reversed(list(STOPWORDS)):
        lang_out = F.when(F.col(f"__hit_{lang}__") == best, F.lit(lang)).otherwise(lang_out)
    lang_out = F.when(best.cast("double") / n_safe >= 0.05, lang_out).otherwise(F.lit("und"))

    # quality: same formula as quality_score, over the shared columns
    length_score = F.least(F.col("__n__").cast("double") / F.lit(20.0), F.lit(1.0))
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    punct_score = F.greatest(
        F.lit(1.0) - (punct / F.greatest(F.length(t), F.lit(1)).cast("double")) * 4.0,
        F.lit(0.0))
    stop_score = F.least(
        (F.col("__hit_en__").cast("double") / n_safe.cast("double")) * 5.0, F.lit(1.0))
    quality = length_score * 0.4 + punct_score * 0.3 + stop_score * 0.3

    word_chars = F.length(F.regexp_replace(t, r"[^A-Za-z0-9]", ""))
    other = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    n_subtokens = (F.ceil(word_chars / F.lit(4.0)) + other).cast("long")

    m61 = (1 << 61) - 1
    tok_h = F.transform(toks, lambda tk: md5_int64(tk) % F.lit(1 << 31))
    fingerprint = F.aggregate(
        tok_h, F.lit(0).cast("long"),
        lambda acc, h: ((acc % F.lit(1 << 41)) * F.lit(1000003) + h) % F.lit(m61))

    return hits.select(
        "id",
        lang_out.alias("lang_detected"),
        quality.alias("quality"),
        F.col("__n__").cast("int").alias("n_tokens"),
        n_subtokens.alias("n_subtokens"),
        fingerprint.alias("fingerprint"),
    )
