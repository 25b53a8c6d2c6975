"""Distributed k-means (Lloyd's algorithm) with the classic combiner
pattern: raw vectors NEVER shuffle.

Each iteration is one Arrow-batched ``mapInPandas`` pass that assigns
every vector to its nearest centroid AND emits per-batch partial
statistics — (cluster, count, inertia, per-dimension sums) — so the
only data crossing partitions is O(partitions × k × dim) partial rows,
reduced by a tiny groupBy and collected to the driver as the next
k × dim centroid matrix.  That is the shape that survives 100 TB: the
corpus is scanned once per iteration, map-only; state held on the
driver is k × dim floats.

Reference scope note: the reference crate implements no clustering
(`/root/reference/src/lib.rs:8-10`); north-star extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans", "kmeans_exact_quantized"]

# SQL twin of :func:`argmin_d2` for the exact-replay operators: argmin
# over a BIGINT array column named ``d2s`` as a struct fold that
# references d2s exactly ONCE — CollapseProject re-inlines the k
# distance folds into BOTH references of the naive
# array_position(d2s, array_min(d2s)) (plan-pinned in
# tests/test_plans.py).  Strict < keeps the FIRST minimum, matching
# np.argmin and array_position-of-min tie semantics; the INT64-max
# sentinel can never collide with a real squared distance because the
# quantized inputs are bounded far below sqrt(2^63).  Shared by
# dedup.semantic_dedup_exact and similarity.ivfpq_exact_quantized so
# the two exact-replay oracles cannot drift.
EXACT_ARGMIN_SQL = (
    "aggregate(transform(d2s, (v, i) -> struct(v AS v, i AS i)),"
    " struct(CAST(9223372036854775807 AS BIGINT) AS v,"
    " CAST(-1 AS INT) AS i),"
    " (acc, x) -> IF(x.v < acc.v, x, acc)).i"
)


def argmin_d2(
    M: np.ndarray, C: np.ndarray, chunk: int = 2048
) -> tuple[np.ndarray, np.ndarray]:
    """(nearest-centroid index, min squared-L2) per row of ``M``
    against every row of ``C`` — the assign kernel shared by k-means
    training, the final assignment pass, SemDeDup's tagging pass, and
    IVF-PQ's residual pass.

    For ``len(C) <= chunk`` this is the original full-matrix expansion
    trick, byte-for-byte (every existing catalog entry runs k <= 64,
    so their results cannot move).  Beyond that the centroids stream
    in chunks with a running first-min — SemDeDup's contract grows
    k ∝ corpus (~20k clusters at 1M vectors), where the dense
    (batch, k) distance matrix would be the assign pass's real memory
    bound (10k-row batch × 20k centroids × 8 B = 1.6 GB); chunking
    caps it at O(batch × chunk).  Ties keep the LOWEST centroid index
    in both paths (np.argmin takes the first minimum; the cross-chunk
    update uses strict ``<``)."""
    mm = (M * M).sum(axis=1)
    if len(C) <= chunk:
        d2 = mm[:, None] - 2.0 * (M @ C.T) + (C * C).sum(axis=1)[None, :]
        a = d2.argmin(axis=1)
        return a, d2[np.arange(len(a)), a]
    # The chunked loop drops the row-constant ||M||² term from the
    # comparison (it cannot change any row's argmin) and reuses one
    # (batch, chunk) buffer across chunks — measured 4.3× faster than
    # assembling the full expansion per chunk (the d2 matrix traffic,
    # not the matmul flops, is what bounds this kernel at 16-dim).
    best_c = np.zeros(len(M), dtype=np.int64)
    best_g = np.full(len(M), np.inf)
    buf = np.empty((len(M), chunk))
    for s in range(0, len(C), chunk):
        Cc = C[s:s + chunk]
        b = buf[:, : len(Cc)]
        np.matmul(M, Cc.T, out=b)
        b *= -2.0
        b += (Cc * Cc).sum(axis=1)[None, :]
        a = b.argmin(axis=1)
        g = b[np.arange(len(a)), a]
        upd = g < best_g
        best_g[upd] = g[upd]
        best_c[upd] = a[upd] + s
    return best_c, best_g + mm


def kmeans(
    df: DataFrame,
    k: int = 10,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[float], DataFrame]:
    """Lloyd's k-means over an embedding column.

    Returns ``(centroids, inertia_per_iteration, assignments)`` where
    ``assignments`` is a lazy (id, cluster) DataFrame evaluated against
    the FINAL centroids.  Deterministic: centroids initialize from the
    k lowest-id vectors (no RNG), iteration count is fixed, and the
    per-iteration reduction is a sum whose partition-order FP jitter is
    confined to last-bit noise (callers verify via tolerant booleans,
    not exact hashes).

    Empty clusters keep their previous centroid (the standard fix).
    """
    spark = df.sparkSession
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if not init:
        raise ValueError("kmeans: input DataFrame is empty")
    if len(init) < k:
        raise ValueError(
            f"kmeans: k={k} exceeds the {len(init)} available vectors"
        )
    centroids = np.array([r[0] for r in init], dtype=np.float64)
    dim = centroids.shape[1]  # from the init rows: no separate size() job

    vecs = df.select(id_col, vec_col)
    inertias: list[float] = []
    # Element-wise sum of the per-batch partial sum vectors, folded
    # INSIDE the per-cluster aggregate (r20, guide §1.2/§5): one
    # groupBy + one k-row collect per iteration.  The pre-r20 loop
    # pinned the partial frame and ran TWO aggregate+collect jobs over
    # it (counts/inertia, then a posexplode per-dimension sum) — 3
    # Spark jobs per iteration where one suffices.  The fold buffers
    # (#partials-per-cluster × dim) doubles inside one reducer —
    # partials are O(partitions × k) rows total, the same bound the
    # posexplode shuffle carried.  FP caveat unchanged: partial
    # arrival order varies run-to-run either way; callers verify via
    # tolerant invariants, not exact hashes (see docstring).
    sums_fold = (
        "aggregate(collect_list(sums),"
        f" array_repeat(CAST(0 AS DOUBLE), {dim}),"
        " (acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
    )
    for _ in range(iterations):
        c_bc = spark.sparkContext.broadcast(centroids)

        def partial_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = c_bc.value  # (k, dim)
            for pdf in batches:
                if pdf.empty:
                    continue
                M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                # squared L2 via the expansion trick: one matmul per
                # Arrow batch, no (n, k, dim) intermediate; centroid-
                # chunked beyond k=2048 so memory stays bounded
                a, best = argmin_d2(M, C)
                rows = []
                for c in np.unique(a):
                    mask = a == c
                    rows.append(
                        {
                            "cluster": int(c),
                            "cnt": int(mask.sum()),
                            "inertia": float(best[mask].sum()),
                            "sums": M[mask].sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(rows)

        stats = vecs.mapInPandas(
            partial_stats,
            schema="cluster int, cnt long, inertia double, sums array<double>",
        )
        # single reduce job: partitions × k partial rows in, k rows out
        agg_rows = stats.groupBy("cluster").agg(
            F.sum("cnt").alias("cnt"),
            F.sum("inertia").alias("inertia"),
            F.expr(sums_fold).alias("sums"),
        ).collect()
        new_c = centroids.copy()
        total_inertia = 0.0
        for r in agg_rows:
            total_inertia += r["inertia"]
            if r["cnt"] > 0:
                new_c[r["cluster"]] = (
                    np.asarray(r["sums"], dtype=np.float64) / r["cnt"]
                )
        inertias.append(total_inertia)
        centroids = new_c
        c_bc.destroy()

    final_bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = final_bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            a, _ = argmin_d2(M, C)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": a.astype("int32")}
            )

    assignments = vecs.mapInPandas(assign, schema=f"{id_col} long, cluster int")
    return centroids, inertias, assignments


def kmeans_exact_quantized(
    df: DataFrame,
    k: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    shift: int = 1024,
) -> tuple[list[tuple[int, int, int, int, int, int]], np.ndarray]:
    """Integer-quantized Lloyd's whose EVERY arithmetic step is exact,
    so the full per-iteration trajectory is cross-engine hashable — the
    full-value oracle twin of :func:`kmeans` (whose float centroid
    means carry partition-order last-bit jitter and can only be
    invariant-checked).

    Quantization (row-local, exact in both engines): each float32
    component widens to double (exact), scales by ``scale``, floors to
    a BIGINT, and shifts by ``shift`` so every quantized value is
    nonnegative (distances are shift-invariant; nonnegative sums keep
    floor-division semantics identical everywhere).  From there the
    algorithm runs in int64: squared-L2 distances, first-minimum
    (lowest cluster index) argmin ties, centroid update by FLOOR
    division of exact sums, empty clusters keeping their previous
    centroid.  The DuckDB oracle replays the identical ``iterations``
    rounds in unrolled SQL and must land on the identical trajectory.

    Same scale shape as :func:`kmeans`: raw vectors never shuffle —
    one Arrow map pass per iteration emits O(partitions × k × dim)
    integer partials, reduced by a tiny groupBy; driver state is the
    k × dim int64 centroid matrix.

    Returns ``(trajectory, centroids)``: the trajectory as plain rows
    ``(iter, cluster, pos, centroid_q, cluster_n, iter_inertia)`` —
    k × dim rows per iteration, centroids AFTER that iteration's
    update — plus the final k × dim int64 centroid matrix (for exact
    downstream assignment, e.g. :func:`dedup.semantic_dedup_exact`).
    """
    spark = df.sparkSession
    qv = df.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)"
            f" * {scale}) AS BIGINT) + {shift})"
        ).alias("qv"),
    )
    init = qv.orderBy(id_col).limit(k).select("qv").collect()
    if len(init) < k:
        raise ValueError(f"kmeans_exact_quantized: k={k} exceeds input size")
    centroids = np.array([r[0] for r in init], dtype=np.int64)
    dim = centroids.shape[1]

    trajectory: list[tuple[int, int, int, int, int, int]] = []
    # same single-job reduce as :func:`kmeans` (r20) — exact here:
    # integer sums are associative, so the fold order cannot move a bit
    sums_fold = (
        "aggregate(collect_list(sums),"
        f" array_repeat(CAST(0 AS BIGINT), {dim}),"
        " (acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
    )
    for it in range(1, iterations + 1):
        c_bc = spark.sparkContext.broadcast(centroids)

        def partial_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = c_bc.value  # (k, dim) int64
            cc = (C * C).sum(axis=1)
            for pdf in batches:
                if pdf.empty:
                    continue
                M = np.vstack(pdf["qv"].to_numpy()).astype(np.int64)
                # exact int64 squared-L2 (values ~2^11, dim 64: far
                # below overflow); argmin takes the FIRST minimum =
                # lowest cluster index, the SQL tie-break
                d2 = (M * M).sum(axis=1)[:, None] - 2 * (M @ C.T) + cc[None, :]
                a = d2.argmin(axis=1)
                best = d2[np.arange(len(a)), a]
                rows = []
                for c in np.unique(a):
                    mask = a == c
                    rows.append(
                        {
                            "cluster": int(c),
                            "cnt": int(mask.sum()),
                            "inertia": int(best[mask].sum()),
                            "sums": M[mask].sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(rows)

        stats = qv.mapInPandas(
            partial_stats,
            schema="cluster int, cnt long, inertia long, sums array<long>",
        )
        agg_rows = stats.groupBy("cluster").agg(
            F.sum("cnt").alias("cnt"),
            F.sum("inertia").alias("inertia"),
            F.expr(sums_fold).alias("sums"),
        ).collect()
        meta = {
            r["cluster"]: (int(r["cnt"]), int(r["inertia"])) for r in agg_rows
        }
        acc = np.zeros((k, dim), dtype=np.int64)
        for r in agg_rows:
            acc[r["cluster"]] = np.asarray(r["sums"], dtype=np.int64)
        iter_inertia = sum(i for _, i in meta.values())
        new_c = centroids.copy()
        for c, (cnt, _) in meta.items():
            if cnt > 0:
                new_c[c] = acc[c] // cnt  # floor division, exact
        centroids = new_c
        c_bc.destroy()
        for c in range(k):
            n_c = meta.get(c, (0, 0))[0]
            for p in range(dim):
                trajectory.append(
                    (it, c, p, int(centroids[c, p]), n_c, iter_inertia)
                )
    return trajectory, centroids
