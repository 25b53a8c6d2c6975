"""Iterative graph algorithms as DataFrame loops (Pregel-style).

Complements ``operators/dedup.py:connected_components`` (min-label
propagation).  Each iteration is one keyed shuffle — rank state hashes
by node, edges by source — so a round costs a single hash exchange of
(node, rank) pairs regardless of graph size; the driver only ever holds
loop counters, never data.

Reference scope note: the reference crate has no graph operators
(`/root/reference/src/lib.rs:8-10` registers one scalar UDF); this is
north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_randgen_spark.pinning import pin, unpin

__all__ = ["pagerank", "bfs_distances"]


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    round_to: int | None = 6,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, w)``; returns
    ``(node, rank)``.

    Nodes are the union of sources and destinations.  Each iteration:
    contribution(dst) = sum over incoming (rank(src) * w / out_w(src)),
    rank(dst) = (1-d)/n + d * contribution — nodes with no inbound
    edges keep the teleport term via a left join.  Dangling mass (nodes
    with no outgoing edges) is dropped, the common simplification.

    ``round_to`` rounds the rank after EVERY iteration: cross-engine
    double summation is order-sensitive at the last bits, and rounding
    at each step re-synchronizes both engines onto identical doubles so
    an exact-value oracle can verify the output (the same trick the
    catalog uses for floating aggregates).  Pass None for raw doubles.

    Scale design: the rank frame is (node, rank) — tiny relative to
    edges; the per-iteration join shuffles edges by src ONCE (Catalyst
    reuses the exchange across iterations when the loop is unrolled in
    one plan) and re-aggregates by dst.  For long iteration counts,
    callers should ``localCheckpoint`` every few rounds exactly as
    ``connected_components`` does; at 3-5 iterations lineage stays
    shallow enough to skip it.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm_edges = edges.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("share")
    )

    def _round(c):
        return F.round(c, round_to) if round_to is not None else c

    ranks = nodes.select("node", _round(F.lit(1.0 / n)).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            norm_edges.join(ranks, norm_edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                _round(
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def bfs_distances(
    edges: DataFrame,
    source,
    max_hops: int = 20,
) -> DataFrame:
    """Single-source shortest hop distances over directed ``edges(src,
    dst)`` via level-synchronous BFS; returns ``(node, dist)`` for every
    node reachable within ``max_hops``.

    Each round expands the current frontier through ONE hash equi-join
    on ``src``, dedups, and anti-joins the visited set — so a round
    shuffles (frontier × out-degree) candidate rows, never the whole
    graph's distance state.  The per-round pin
    (:mod:`datafusion_randgen_spark.pinning`: ``localCheckpoint``
    truncates the growing lineage, the same discipline as
    ``dedup.connected_components``; ``persist`` keeps it for
    executor-churn fault tolerance); the per-round ``isEmpty`` probe is
    the standard convergence action (limit-1 scan, not a collect of
    data).  Frontier-based BFS touches each edge at most once per
    incident frontier round — on a 100 TB edge list the per-round cost
    is proportional to the frontier's out-edges, and the visited set
    holds (node, dist) pairs only.

    Pin ownership (ADVICE r11): intermediate frontier pins are released
    as they are superseded, and the TERMINAL frontier (the empty one
    that stops the loop, or the last one when ``max_hops`` exhausts) is
    released here before returning — its rows are already folded into
    the visited pin.  The RETURNED frame is the final visited pin and
    stays pinned under the ``persist`` strategy (same contract as
    ``dedup.connected_components`` / ``dedup.semantic_dedup``):
    long-running callers own its release via ``pinning.unpin`` — or
    ``spark.catalog.clearCache()`` — once done with the result.
    """
    frontier = (
        edges.sparkSession.range(1)
        .select(
            F.lit(source).cast("long").alias("node"),
            F.lit(0).alias("dist"),
        )
    )
    visited = frontier
    for hop in range(1, max_hops + 1):
        frontier = pin(
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop)),
            replaces=frontier if hop > 1 else None,
        )
        if frontier.isEmpty():
            break
        visited = pin(
            visited.union(frontier),
            replaces=visited if hop > 1 else None,
        )
    # terminal frontier: either empty (break) or, with max_hops
    # exhausted, already folded into the visited pin — under persist it
    # would otherwise leak one frame per call (ADVICE r11; no-op when
    # the loop never ran and frontier is the unpinned seed frame)
    unpin(frontier)
    return visited
