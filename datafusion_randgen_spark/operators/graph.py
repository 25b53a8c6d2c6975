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

from datafusion_randgen_spark.pinning import (
    LOCAL_CHECKPOINT,
    get_pin_strategy,
    pin,
    unpin,
)

__all__ = ["pagerank", "bfs_distances"]

# BFS visited-set fold window (localCheckpoint mode): the leaf union is
# compacted into one checkpoint every this-many LEAVES (one leaf per
# probe batch since r21).  Measured on the sf0.1 q_bfs_shortest_path
# entry (~16 live hops): no fold = 1.25× of the pre-r20 eager-re-pin
# loop (plan grows a cached leaf per hop); fold-every-6 recovers it
# while copying the visited set only once per window instead of every
# hop.  After a fold the union carries the folded checkpoint leaf plus
# up to window new leaves, so plan depth is bounded by window+1 leaves
# at peak (ADVICE r20).
_VISITED_FOLD_EVERY = 6

# r21 note — multi-hop probe batching was BUILT, MEASURED, and
# REVERTED this round: expanding 2 levels per probe job cut actions
# 17 → 9 on the sf0.1 entry but Spark did NOT reuse the in-batch
# level-1 exchange (executed plan showed two separate hashpartitioning
# exchanges for the same distinct — the level-1 subtree ran ~3× per
# batch), which is a per-level work MULTIPLIER at scale; wall time
# read parity-to-worse (interleaved A/B in OPTIMIZATION_r21.md).  The
# per-hop floor is AQE stage-jobs (~4-5 per hop: distinct shuffle +
# broadcast builds + probe), not action count.


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

    Scale design (r20): the edge list is pinned ONCE
    (:mod:`datafusion_randgen_spark.pinning`) and ``nodes`` /
    ``norm_edges`` are pinned derivations of it, so the unrolled
    iteration plan iterates over two cached leaves — before the pins,
    every iteration's join/aggregate branch re-planned (and, absent a
    runtime exchange reuse, re-executed) the whole upstream edge
    pipeline: the r20 before-plan of ``q_pagerank_transitions`` shows
    28 parquet scans of the events table in ONE plan, zero reused.
    The rank frame is (node, rank) — tiny relative to edges; each
    iteration is one join + one re-aggregation by dst over the cached
    edge share table.  Pin ownership: the returned frame derives from
    the pins, which stay pinned under ``persist`` — long-running
    callers release them via ``spark.catalog.clearCache()`` when done
    (no-op under the default ``localCheckpoint`` mode).
    """
    src_edges = pin(edges.select("src", "dst", "w"))
    nodes = pin(
        src_edges.select(F.col("src").alias("node"))
        .union(src_edges.select(F.col("dst").alias("node")))
        .distinct(),
        eager=False,
    )
    n = nodes.count()  # materializes the lazy nodes pin in the same job
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    out_w = src_edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm_edges = pin(
        src_edges.join(out_w, "src").select(
            "src", "dst", (F.col("w") / F.col("out_w")).alias("share")
        )
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
    graph's distance state.  Frontier-based BFS touches each edge at
    most once per incident frontier round — on a 100 TB edge list the
    per-round cost is proportional to the frontier's out-edges, and
    the visited set holds (node, dist) pairs only.

    Round mechanics under the default ``localCheckpoint`` pin strategy
    (r20 — guide §1.2 "the distributed algorithm" / §5 driver work):
    ONE Spark ACTION per hop.  The new frontier is pinned LAZILY and
    materialized by the ``count()`` emptiness probe, and ``visited``
    is the logical UNION of the per-hop checkpoint leaves, FOLDED into
    a single checkpoint every ``_VISITED_FOLD_EVERY`` hops (the fold
    pin is itself lazy — the next hop's probe job materializes it, so
    the one-action/hop contract holds; the fold is skipped on the
    final hop, where nothing further reads it — ADVICE r20).  The
    pre-r20 loop ran 3 actions per hop (eager frontier checkpoint,
    ``isEmpty`` probe, eager ``visited ∪ frontier`` re-checkpoint),
    and the visited re-pin re-copied the ENTIRE visited set every hop
    — O(V) extra work per round, O(V·hops) total.  The pure
    union-of-leaves variant (first r20 cut) never re-copies, but its
    per-hop plan carries one leaf per PRIOR hop and the growing
    analysis/scan overhead measured 1.25× on the sf0.1 entry
    (interleaved A/B, 4 pairs).  The fold bounds both: plan depth ≤
    window+1 leaves at peak, visited copied O(V·hops/window) instead
    of O(V·hops).

    Under ``persist`` the pre-r20 loop is kept verbatim: lineage is
    not truncated there, so a union-of-pins visited set would nest
    each hop's anti-join plan inside the next (exponential analysis
    cost), and the single-owned-pin contract below is part of the
    strategy's documented API.

    Pin ownership (ADVICE r11): under ``persist``, intermediate
    frontier pins are released as they are superseded and exactly one
    pinned frame — the returned visited set — survives the call;
    long-running callers release it via ``pinning.unpin`` or
    ``spark.catalog.clearCache()``.  Under ``localCheckpoint`` the
    per-hop checkpoint blocks are GC'd with the returned DataFrame.
    """
    frontier = (
        edges.sparkSession.range(1)
        .select(
            F.lit(source).cast("long").alias("node"),
            F.lit(0).alias("dist"),
        )
    )
    visited = frontier

    def _expand(cur: DataFrame, seen: DataFrame, hop: int) -> DataFrame:
        return (
            cur.join(edges, cur.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(seen.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
        )

    if get_pin_strategy() == LOCAL_CHECKPOINT:
        leaves = 0
        for hop in range(1, max_hops + 1):
            nxt = pin(_expand(frontier, visited, hop), eager=False)
            if nxt.count() == 0:  # materializes the lazy pin, one job
                break
            frontier = nxt
            visited = visited.union(nxt)
            leaves += 1
            if leaves >= _VISITED_FOLD_EVERY and hop < max_hops:
                # fold the leaf union into ONE lazy checkpoint (the
                # next hop's probe job materializes it): plan depth is
                # bounded by window+1 leaves, and the visited set is
                # copied once per window instead of every hop.  Skipped
                # on the final hop — no further probe reads the fold,
                # so a terminal fold would make the caller's first
                # action pay one pure-overhead O(V) copy (ADVICE r20).
                visited = pin(visited, eager=False)
                leaves = 0
        return visited

    for hop in range(1, max_hops + 1):
        frontier = pin(
            _expand(frontier, visited, hop),
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
