"""Distributed graph primitives.

One operator for now — weakly-connected components — because it is the
graph computation data pipelines actually run (duplicate clusters,
entity resolution, user stitching).  Kept generic here so callers
other than text dedup (which wraps it as
:func:`..dedup.duplicate_clusters`) can feed any edge list.

The algorithm is min-label propagation with **one label per node per
round** — the current (node → label) relation joins the symmetric edge
list and keeps ``min(own, neighbor)``; it never materializes the
O(|component|²) reachability relation a naive transitive closure
builds.  Rounds needed = graph diameter.  Each round is one join + one
aggregate on the high-entropy node key; ``localCheckpoint`` truncates
lineage so the iterated plan stays flat, matching how Spark's own
iterative algorithms (e.g. MLlib's) bound plan growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iterations: int = 50) -> DataFrame:
    """Label every node of the undirected graph given by ``edges`` with
    its component's minimum node id.

    Edges are treated as undirected (symmetrized internally); self
    loops and duplicate edges are harmless.  Output: ``id, component``
    — one row per node appearing in ≥1 edge (isolated nodes never
    reach an edge list; they are their own singleton components by
    definition).

    Scale: per round, shuffle = |nodes| + |edges| rows on node-id keys;
    memory = one (id, label) row per node.  Diameter-bounded rounds —
    for near-duplicate cliques 1-2, for pathological chains pass a
    higher ``max_iterations`` (raises rather than silently returning a
    half-merged labeling).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))) \
           .persist()
    labels = (sym.select(F.col("s").alias("id")).distinct()
              .withColumn("lbl", F.col("id"))
              .localCheckpoint(eager=True))
    for _ in range(max_iterations):
        prop = (labels.join(sym, labels.id == sym.s)
                .select(F.col("d").alias("id"), F.col("lbl")))
        new_labels = (labels.unionByName(prop)
                      .groupBy("id").agg(F.min("lbl").alias("lbl"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.join(labels.withColumnRenamed("lbl", "old"), "id")
                   .filter(F.col("lbl") < F.col("old")))
        if changed.isEmpty():
            sym.unpersist()
            return new_labels.select("id", F.col("lbl").alias("component"))
        labels = new_labels
    sym.unpersist()
    raise RuntimeError(f"no fixpoint after {max_iterations} label rounds")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 3, damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (Page & Brin,
    1998) — the importance weighting data-curation pipelines apply to
    link/domain graphs (seed-quality ranking à la Common Crawl).

    Deterministic, oracle-friendly formulation: exactly ``iterations``
    synchronous updates from the uniform start,
    ``pr'(v) = (1−d)/N + d · Σ_{u→v} pr(u)/outdeg(u)``, with NO
    dangling-mass redistribution (a dangling node's mass simply decays
    — the variant whose update is a pure join+aggregate; document-graph
    use cases re-normalize at read time if they need a distribution).

    Scale shape per iteration: one equi-join of the (node, pr) relation
    against the edge list on the src key and one partial-agg groupBy on
    dst — shuffle rows = |edges| + |nodes|, never adjacency-matrix
    anything; ``localCheckpoint`` truncates the iterated lineage (the
    :func:`connected_components` discipline).  Contribution sums are
    floating-point adds in shuffle order, so cross-engine comparison
    rounds (the bm25 precedent); within one engine the result is stable.

    Output: ``id, pagerank`` — one row per node appearing in ≥1 edge.
    """
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id")))
             .distinct())
    n_nodes = nodes.count()  # one scalar job; reused as a plain literal
    if n_nodes == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    pr = nodes.withColumn("pagerank", F.lit(1.0 / n_nodes))
    base = 1.0 - damping
    for _ in range(max(iterations, 0)):
        contribs = (e.join(pr, e.src == pr.id)
                    .join(outdeg, "src")
                    .select(F.col("dst").alias("id"),
                            (F.col("pagerank") / F.col("outdeg"))
                            .alias("c"))
                    .groupBy("id").agg(F.sum("c").alias("c")))
        pr = (nodes.join(contribs, "id", "left")
              .select("id",
                      (F.lit(base / n_nodes)
                       + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0)))
                      .alias("pagerank"))
              .localCheckpoint(eager=False))
    return pr


def triangle_stats(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Triangle census of an undirected graph — one row with node/edge
    counts, triangle count, wedge (open-triple) count, and global
    transitivity ``3·T / W``.  On a near-duplicate pair graph this is
    the clique-density gauge: true duplicate groups are near-cliques
    (transitivity → 1), while chained false positives from an
    over-loose threshold form paths (transitivity → 0) — a one-number
    health check for the dedup threshold, run like the MinHash
    precision/recall gauge.

    Plan — the classic oriented-join formulation: dedupe + orient every
    edge low-id → high-id (each triangle counted exactly once as
    a < b < c), then one self-join on the shared middle vertex and one
    membership join against the oriented edge list.  Join fan-out is
    Σ C(deg⁺, 2) — bounded by the pair generator's ``max_df`` guard
    upstream on dedup graphs; for general graphs the orientation
    already assigns each edge to its lower-id end, the standard
    skew-taming trick.  Wedges come from a degree aggregate
    (Σ C(deg, 2), exact integers).  Transitivity is the single final
    division.

    Output: ``n_nodes, n_edges, n_triangles, n_wedges, transitivity``
    (NULL transitivity on a wedge-free graph).
    """
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b"))
         .distinct())
    # triangles: (a<b) ⋈ (b<c) ⋈ membership of (a<c)
    e1 = e
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (e1.join(e2, "b")
           .join(e3, (F.col("a") == F.col("ta"))
                 & (F.col("c") == F.col("tc")))
           .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    und = e.select(F.col("a").alias("node")) \
        .unionAll(e.select(F.col("b").alias("node")))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / F.lit(2))
        .cast("long").alias("n_wedges"))
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (stats.crossJoin(F.broadcast(n_edges))
            .crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles", "n_wedges",
                    F.when(F.col("n_wedges") > 0,
                           F.lit(3.0) * F.col("n_triangles")
                           / F.col("n_wedges").cast("double"))
                    .alias("transitivity")))
