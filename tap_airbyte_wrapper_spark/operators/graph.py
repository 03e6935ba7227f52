"""Distributed graph scoring: PageRank over an edge DataFrame.

Why it's here: web-corpus curation uses link-graph centrality as a
document/domain quality prior (Common Crawl-derived pipelines rank
hosts by harmonic/PageRank centrality and sample high-centrality
content preferentially).  The engine's quality layer already scores
documents in isolation (classifier, perplexity, heuristics); PageRank
adds the INTER-document signal, and is the engine's representative of
the iterative-algorithm family (fixed-point computations expressed as
repeated joins, not expressible as one SQL query — the oracle unrolls
the iterations instead).

Semantics (matched bit-for-bit by the unrolled DuckDB oracle in
plans/queries.py):

* nodes = distinct union of sources and destinations
* ranks start uniform at 1/N
* per iteration:  r'(v) = (1-d)/N + d * (in_mass(v) + dangling/N)
  where in_mass(v) = sum over in-edges (u,v) of r(u)/outdeg(u), and
  ``dangling`` is the rank mass sitting on nodes with no out-edges
  (redistributed uniformly — the standard stochastic-matrix fix).
* duplicate (src, dst) rows count once (the edge set is distinct-ed).

Total rank mass is conserved at 1.0 every iteration (asserted in
tests), so scores are comparable across graphs.

Scale shape: each iteration is one shuffle — ``ranks ⋈ edges`` on src
(edges carry precomputed outdeg, so the join payload is (dst, r/deg))
then a groupBy(dst) sum; the dangling term is a one-row aggregate
broadcast into the update.  The edge list is the big side and is never
re-derived (cached once with its outdegrees); rank frames are
node-sized.  Each iteration's result is cut out of the lineage with an
eager ``localCheckpoint``: the rank frame feeds THREE subtrees of the
next iteration (contribution join, dangling aggregate, update), so an
unbroken lineage re-computes it 3^k times by iteration k — measured at
sf0.1: 23 s uncheckpointed vs ~2 s checkpointed for 5 iterations (the
classic iterative-Spark failure, same reason GraphX checkpoints its
deltas).  At 100 TB of edges, ranks (one row per node) still fit
comfortably distributed; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "degrees"]

def degrees(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """(node, out_deg, in_deg) over the DISTINCT edge set."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    out = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    inn = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg"))
    return (out.join(inn, "node", "full")
            .select("node",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg")))


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution.

    Returns (node, rank); ranks sum to 1.  ``n_iter`` fixed iterations
    (the oracle unrolls the same count — convergence thresholds would
    make the result depend on float-comparison order, which no
    cross-engine check could pin).
    """
    # e is read by THREE consumers (the degree table and the
    # contribution join twice-removed) — uncached, the upstream edge
    # derivation would run once per consumer
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct().persist()
    # ONE shuffle yields both the node set and the out-degrees (a
    # separate union-distinct for nodes would be a second node-sized
    # shuffle over the same rows); read every iteration by the
    # dangling aggregate and the update join
    degs = (e.select(F.col("src").alias("node"), F.lit(1).alias("__o"))
            .unionByName(
                e.select(F.col("dst").alias("node"), F.lit(0).alias("__o")))
            .groupBy("node").agg(F.sum("__o").alias("out_deg"))
            .persist())
    nodes = degs.select("node")
    outdeg = degs.filter(F.col("out_deg") > 0).select(
        F.col("node").alias("src"), F.col("out_deg").alias("deg"))
    # the per-iteration join side: (src, dst, deg); both inputs cached
    ej = e.join(outdeg, "src")
    try:
        n = nodes.count()  # metadata-scale action (one long/partition)
        if n == 0:
            # empty graph: empty (node, rank) frame, no 1/0 teleport
            return nodes.withColumn("rank", F.lit(0.0))
        # rank frames are node-count-sized; without an explicit
        # coalesce the per-iteration checkpoint inherits the join's
        # full shuffle partitioning (task overhead dominates on
        # small-to-medium graphs; measured 1.2 s -> ~0.3 s per
        # iteration at sf0.1)
        rank_parts = max(1, min(edges.sparkSession.sparkContext
                                .defaultParallelism, -(-n // 250_000)))

        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        for _ in range(n_iter):
            contrib = (
                ej.join(ranks.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("deg"))
                     .alias("in_mass")))
            # dangling mass: rank sitting on nodes with no out-edges —
            # a one-ROW aggregate, so collecting it to the driver is
            # metadata-scale at any corpus size; re-injected as a
            # literal it saves the broadcast-exchange stage a crossJoin
            # would add to every iteration.  The expression below keeps
            # the oracle's exact operation order (float + is
            # non-associative).
            dangling = (
                ranks.join(degs.filter(F.col("out_deg") == 0)
                           .select("node"), "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0])
            ranks = (
                nodes.join(contrib, "node", "left")
                .select(
                    "node",
                    (F.lit((1.0 - damping) / n)
                     + F.lit(damping)
                     * (F.coalesce("in_mass", F.lit(0.0))
                        + F.lit(dangling) / n)).alias("rank"))
                .coalesce(rank_parts)
                # eager cut EVERY iteration: ranks feeds three subtrees
                # of the next one — see the module docstring's 3^k note
                .localCheckpoint(eager=True))
        return ranks
    finally:
        # the returned frame is checkpointed (or derives from nothing),
        # so the scratch caches can always be released — including on
        # error paths
        e.unpersist()
        degs.unpersist()
