"""Distributed k-means over embedding columns — the clustering pass a
training-data pipeline runs for corpus cartography (cluster-balanced
mixing, SemDeDup-style cell assignment, topic-coverage audits).

The Lloyd's loop here is built so the corpus NEVER SHUFFLES:

* assignment is a narrow map against *literal* centroids (k·d numbers,
  driver-held — the same contract as :mod:`.similarity`'s IVF coarse
  quantizer);
* the update step is ``groupBy(cluster, dimension)`` over posexploded
  coordinates — k·d distinct keys with map-side partial aggregation, so
  each input partition emits at most k·d rows into the exchange no
  matter how many vectors it holds;
* per iteration the driver collects k·d bounded rows (the sums), never
  data-sized state.

Float determinism (what makes an external SQL oracle possible — the
usual k-means is irreproducible because double means are
partition-order dependent):

* input vectors are quantized ONCE to integer micro-units
  (``round(x·1e6)`` as bigint) — reproducible because a float can never
  land exactly on a .5 micro boundary of the *product* unless the
  product is dyadic, in which case both engines' round() is
  away-from-zero;
* centroid state is the exact bigint coordinate SUM and member count;
  the mean ``S/n`` is one correctly-rounded IEEE division, identical in
  every engine;
* squared distances are evaluated as an index-ordered left fold
  ``((x₁−μ₁)² + (x₂−μ₂)²) + …`` — Spark's ``aggregate`` and DuckDB's
  ``list_reduce`` both fold left-to-right over the same doubles, so the
  argmin (ties → smaller cluster id) is bit-identical;
* reported inertia is ``Σ floor(dist)`` in integer micro² units — a
  bigint sum, order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .parallelism import spread

_SCALE = 1_000_000.0


def quantize_micro(vec: Column) -> Column:
    """array<float|double> → array<bigint> in micro-units."""
    return F.transform(
        vec, lambda v: F.round(v.cast("double") * F.lit(_SCALE), 0)
        .cast("long"))


def _dist_expr(xd: Column, mu: list[float]) -> Column:
    """Index-ordered left-fold squared distance to a literal centroid
    (micro-unit doubles) — bit-reproducible, see module docstring."""
    lits = F.array(*[F.lit(float(m)) for m in mu])
    return F.aggregate(
        F.zip_with(xd, lits, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v)


def kmeans_clusters(df: DataFrame, vec_col: str, id_col: str,
                    k: int = 8, iters: int = 3) -> DataFrame:
    """Lloyd's k-means; seeds are the ``k`` smallest-id vectors (their
    quantized coordinates, n=1).  Empty clusters keep their previous
    centroid.  Returns one row per non-empty final cluster:
    ``cluster_id, n_members, inertia`` (inertia in integer micro²
    units).
    """
    q = (spread(df)
         .select(F.col(id_col).alias("vid"),
                 quantize_micro(F.col(vec_col)).alias("xq"))
         .withColumn("xd", F.transform("xq",
                                       lambda v: v.cast("double"))))
    q = q.persist()
    try:
        seeds = (q.select("vid", "xq").orderBy("vid").limit(k).collect())
        # centroid state: cid -> (sum list (python ints), count)
        cents = {i: ([int(x) for x in r["xq"]], 1)
                 for i, r in enumerate(seeds)}

        def assign(frame: DataFrame) -> DataFrame:
            pairs = [F.struct(
                _dist_expr(F.col("xd"), [s / n for s in ssum]).alias("d"),
                F.lit(cid).alias("cid"))
                for cid, (ssum, n) in sorted(cents.items())]
            best = F.array_min(F.array(*pairs))
            return frame.withColumn("d", best["d"]) \
                        .withColumn("cid", best["cid"])

        for _ in range(int(iters)):
            sums = (assign(q)
                    .select("cid", F.posexplode("xq").alias("pos", "x"))
                    .groupBy("cid", "pos")
                    .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
                    .collect())
            by_cid: dict[int, tuple[list[int], int]] = {}
            for r in sums:
                ssum, _ = by_cid.setdefault(
                    int(r["cid"]),
                    ([0] * len(cents[0][0]), int(r["n"])))
                ssum[int(r["pos"])] = int(r["s"])
            # clusters that lost every member keep their previous state
            cents = {cid: by_cid.get(cid, prev)
                     for cid, prev in cents.items()}

        rows = (assign(q)
                .groupBy(F.col("cid").alias("cluster_id"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                     F.sum(F.floor("d")).cast("long").alias("inertia"))
                .orderBy("cluster_id")
                .collect())  # ≤ k rows — bounded driver state
        return df.sparkSession.createDataFrame(
            rows, "cluster_id int, n_members long, inertia long")
    finally:
        q.unpersist()
