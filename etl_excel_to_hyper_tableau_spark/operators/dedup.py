"""Deduplication operators for training-data pipelines.

All variants are pure DataFrame ops (JVM-side expressions, no Python in
the hot path) and scale by construction:

* :func:`exact_dedup` — hash-groupBy on content digest; one shuffle on
  a high-entropy key (md5), so no skew; at 100 TB this is the classic
  map-side-combine + exchange plan.
* :func:`ngram_jaccard_pairs` — exact Jaccard via shingle inverted
  index: explode distinct shingles → equi-join on shingle → count
  common shingles per pair.  Never compares documents that share no
  shingle — the join *is* the candidate filter.  Shuffle key = shingle
  hash; hot shingles (stopword-grams) are capped via document-frequency
  pruning (``max_df``) exactly like a real dedup pipeline drops
  too-common shingles.
* :func:`minhash_lsh_candidates` / :func:`minhash_dedup` — MinHash
  signatures banded into LSH buckets; candidates only join within a
  bucket.  Signature arithmetic is engine-portable
  (:mod:`..functions.hashing`), so an external SQL oracle can verify
  values bit-for-bit.
* :func:`simhash_pairs` — 60-bit SimHash with pigeonhole banding:
  pairs within Hamming distance *d* share at least one of *d+1* bit
  chunks, so bucketing on chunks finds all of them without O(n²).
* :func:`embedding_cosine_pairs` — near-duplicate detection on an
  embedding column; exact all-pairs within blocks for small/verified
  runs, random-hyperplane (sign-LSH) bucketing for the scale path.

Pair conventions: output pairs always have ``id_a < id_b``; dedup
variants keep the smallest id of each duplicate group (standard
"first-writer-wins" semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import (
    MERSENNE61, char_ngrams, md5_int64, minhash_signature, perm_constants,
    simhash64,
)


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep one row (smallest ``id_col``) per distinct content.

    Digest = md5 over the concatenated content columns (null-safe with
    unit separators).  GroupBy the digest → min id → semi-join back.
    Two shuffles total, both on high-entropy keys; the semi-join
    broadcasts when the survivor set is small.
    """
    digest = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                                         for c in content_cols]))
    with_digest = df.withColumn("__digest__", digest)
    survivors = (with_digest.groupBy("__digest__")
                 .agg(F.min(id_col).alias(id_col)))
    return (with_digest.join(survivors, [id_col, "__digest__"], "left_semi")
            .drop("__digest__"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_df: int | None = None) -> DataFrame:
    """All pairs with character-n-gram Jaccard ≥ threshold.

    Plan: distinct shingles per doc → explode → (optional) drop
    shingles appearing in more than ``max_df`` docs (stopword-shingle
    skew guard — at 100 TB a shingle like ``'the'`` would otherwise
    create a quadratic bucket; with it, per-shingle join fan-out is
    bounded by ``max_df²``) → self-equi-join on shingle → count common
    shingles per (a, b) → Jaccard from inclusion–exclusion.

    With ``max_df`` set, the result is Jaccard **over the pruned
    shingle space**: document sizes are recomputed after pruning, so
    identical documents still score exactly 1.0 and the measure stays a
    true Jaccard (of the informative, non-stopword shingles).

    Output: ``id_a, id_b, jaccard`` with ``id_a < id_b``.
    """
    shingled = (df.select(F.col(id_col).alias("id"),
                          F.array_distinct(char_ngrams(F.col(text_col), n)).alias("sh"))
                .withColumn("sz", F.size("sh")))
    exploded = shingled.select("id", "sz", F.explode("sh").alias("g"))
    if max_df is not None:
        df_counts = exploded.groupBy("g").count().filter(F.col("count") <= max_df)
        exploded = (exploded.drop("sz")
                    .join(F.broadcast(df_counts.select("g")), "g"))
        sizes = exploded.groupBy("id").agg(F.count("*").alias("sz"))
        exploded = exploded.join(sizes, "id")
    a = exploded.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "g")
    b = exploded.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "g")
    common = (a.join(b, "g")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b", "sz_a", "sz_b")
              .agg(F.count("*").alias("common")))
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (common.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def with_minhash(df: DataFrame, text_col: str, id_col: str,
                 k: int = 32, n: int = 3) -> DataFrame:
    """Attach a k-wide MinHash signature column ``sig`` (array<bigint>)."""
    return df.select(F.col(id_col).alias("id"),
                     minhash_signature(F.col(text_col), k=k, n=n).alias("sig"))


def minhash_lsh_candidates(df: DataFrame, text_col: str, id_col: str,
                           k: int = 32, n: int = 3, bands: int = 8) -> DataFrame:
    """Candidate pairs via LSH banding: signature split into ``bands``
    bands of ``k//bands`` rows; docs sharing any band hash are
    candidates.  Shuffle key = (band index, band digest) — uniformly
    distributed, so bucket skew only appears where true near-duplicate
    clusters exist (which is exactly the data you must look at anyway).

    Output: ``id_a, id_b, est_jaccard`` (estimate = fraction of equal
    signature positions), deduped across bands.
    """
    r = k // bands
    sigs = with_minhash(df, text_col, id_col, k=k, n=n).filter(F.size("sig") > 0)
    band_arr = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.md5(F.concat_ws(",", *[F.col("sig")[i * r + j].cast("string")
                                          for j in range(r)])).alias("bh"))
        for i in range(bands)
    ])
    buckets = sigs.select("id", "sig", F.explode(band_arr).alias("b")) \
                  .select("id", "sig", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    a = buckets.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bh")
    b = buckets.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bh")
    pairs = (a.join(b, ["band", "bh"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b")
             .distinct())
    # estimated Jaccard = fraction of equal signature positions
    eq = F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))")
    return pairs.select("id_a", "id_b",
                        (eq.cast("double") / F.lit(k)).alias("est_jaccard"))


def minhash_dedup(df: DataFrame, text_col: str, id_col: str,
                  k: int = 32, n: int = 3, bands: int = 8,
                  threshold: float = 0.7) -> DataFrame:
    """Drop every doc that has a candidate near-duplicate with a smaller
    id (single-linkage by transitivity is deliberately NOT computed —
    one LSH round removes the overwhelming mass of duplicates and keeps
    the operator a bounded number of shuffles; iterate to a fixpoint for
    full connected components)."""
    cand = (minhash_lsh_candidates(df, text_col, id_col, k=k, n=n, bands=bands)
            .filter(F.col("est_jaccard") >= threshold))
    losers = cand.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def with_simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Attach a 60-bit SimHash over whitespace tokens."""
    tokens = F.split(F.col(text_col), r"\s+")
    return df.select(F.col(id_col).alias("id"), simhash64(tokens).alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of each other.

    Pigeonhole banding: split the 60-bit hash into ``max_hamming + 1``
    chunks; any pair within distance d ≤ max_hamming agrees exactly on
    at least one chunk, so an equi-join per chunk finds all true pairs
    without O(n²).  Output: ``id_a, id_b, hamming``.
    """
    chunks = max_hamming + 1
    width = 60 // chunks
    sh = with_simhash(df, text_col, id_col)
    chunk_arr = F.array(*[
        F.struct(F.lit(i).alias("chunk"),
                 F.shiftright(F.col("simhash"), i * width)
                  .bitwiseAND(F.lit((1 << width) - 1)).alias("ck"))
        for i in range(chunks)
    ])
    buck = sh.select("id", "simhash", F.explode(chunk_arr).alias("c")) \
             .select("id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.ck").alias("ck"))
    a = buck.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), "chunk", "ck")
    b = buck.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), "chunk", "ck")
    pairs = (a.join(b, ["chunk", "ck"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "h_a", "h_b")
             .distinct())
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (pairs.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic order, so an
    external oracle reproducing the same fold gets the identical double."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def embedding_cosine_pairs(df: DataFrame, vec_col: str, id_col: str,
                           threshold: float = 0.95,
                           use_lsh: bool = False, planes: int = 16) -> DataFrame:
    """Near-duplicate pairs by cosine similarity ≥ threshold.

    ``use_lsh=False``: exact all-pairs (cross join pruned by id<id) —
    the verification baseline; quadratic, fine up to ~10⁵ vectors.
    ``use_lsh=True``: random-hyperplane sign-LSH — vectors bucketed by
    the sign pattern of ``planes`` deterministic integer hyperplanes
    (components derived from md5, so portable); only intra-bucket pairs
    are compared.  Recall < 1 by design; raise ``planes`` banding or
    run multiple tables for higher recall.
    """
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("vec"))
    v = v.withColumn("nrm", _norm(F.col("vec")))
    if use_lsh:
        sig = _sign_lsh_signature(F.col("vec"), planes)
        v = v.withColumn("bucket", sig)
        a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"),
                     F.col("nrm").alias("na"), "bucket")
        b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"),
                     F.col("nrm").alias("nb"), "bucket")
        joined = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
        b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
        joined = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (joined.withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def _sign_lsh_signature(vec: Column, planes: int) -> Column:
    """Sign pattern of ``planes`` deterministic hyperplanes as a string.

    Hyperplane components are integers in [-1000, 1000] derived from
    ``md5('p{i}_d{j}')`` — reproducible in any engine with md5 (the
    oracle SQL embeds the same construction)."""
    parts = []
    for p in range(planes):
        comp = F.transform(
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda j, p=p: (md5_int64(F.concat(F.lit(f"p{p}_d"), j.cast("string")))
                            % 2001 - 1000).cast("double"))
        dot = F.aggregate(F.zip_with(vec, comp, lambda x, c: x * c),
                          F.lit(0.0), lambda acc, x: acc + x)
        parts.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)
