"""Similarity search over an embedding column (``array<float>``).

* :func:`topk_cosine` — brute-force exact top-k: one pass over the
  corpus, per-partition partial top-k via sort+limit (Spark's
  ``TakeOrderedAndProject`` — no full sort, no full shuffle), the
  correctness baseline at any corpus size where a full scan is
  acceptable.
* :func:`topk_cosine_batch` — many queries at once: broadcast the
  (small) query set, cross join against the corpus, window-rank per
  query.  The corpus never shuffles — only the tiny result set does.
* :func:`ann_topk_lsh` — the scale path: sign-LSH bucketing (shared
  with :mod:`.dedup`) prunes the corpus to the query's bucket (plus
  multi-probe neighbors at Hamming distance 1), trading recall for a
  ~2^planes search-space reduction — the standard recipe when the
  corpus no longer admits a full scan per query.

All math is Catalyst expressions (``zip_with``/``aggregate``): JVM
codegen, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import _dot, _norm, _sign_lsh_signature


def _cosine(vec: Column, qvec: Column) -> Column:
    return _dot(vec, qvec) / (_norm(vec) * _norm(qvec))


def topk_cosine(df: DataFrame, vec_col: str, id_col: str,
                query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine similarity to one literal query vector.

    Ties broken by id for determinism.  Output: ``id, cosine`` (k rows).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("id"),
        _cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)


def topk_cosine_batch(corpus: DataFrame, queries: DataFrame,
                      vec_col: str, id_col: str,
                      query_vec_col: str, query_id_col: str,
                      k: int = 10) -> DataFrame:
    """Exact top-k for a batch of query vectors.

    The query side is broadcast (it is small by assumption); the corpus
    is scanned once with no shuffle; only (num_queries × k) rows leave
    the scan stage via the window rank.
    Output: ``query_id, id, cosine, rank``.
    """
    c = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("vec"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).cast("array<double>").alias("qvec"))
    scored = (c.crossJoin(F.broadcast(q))
              .select("query_id", "id", _cosine(F.col("vec"), F.col("qvec")).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame,
                 vec_col: str, id_col: str,
                 query_vec_col: str, query_id_col: str,
                 k: int = 10, planes: int = 8,
                 multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: compare only within the query's sign-LSH
    bucket (plus, with ``multiprobe``, all buckets at Hamming distance
    1 — flips one plane's sign), so each query touches ~(planes+1)/2^planes
    of the corpus instead of all of it.

    Output: ``query_id, id, cosine, rank`` — rank within retrieved
    candidates; recall vs exact top-k depends on ``planes``.
    """
    c = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("vec"))
    first = c.select("vec").first()
    if first is None:
        raise ValueError("ann_topk_lsh on an empty corpus")
    dim = len(first["vec"])
    c = c.withColumn("bucket", _sign_lsh_signature(F.col("vec"), planes, dim))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).cast("array<double>").alias("qvec"))
    q = q.withColumn("bucket", _sign_lsh_signature(F.col("qvec"), planes, dim))
    if multiprobe:
        # probe the exact bucket and every 1-bit-flip neighbor
        probes = F.array(F.col("bucket"), *[
            F.concat(F.substring("bucket", 1, i),
                     F.when(F.substring("bucket", i + 1, 1) == "1", "0").otherwise("1"),
                     F.substring("bucket", i + 2, planes - i - 1))
            for i in range(planes)
        ])
        q = q.select("query_id", "qvec", F.explode(probes).alias("bucket"))
    joined = c.join(F.broadcast(q), "bucket")
    scored = joined.select("query_id", "id",
                           _cosine(F.col("vec"), F.col("qvec")).alias("cosine")).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
