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
