"""Vector (embedding) column helpers over ``array<float>`` columns.

Dot products / norms are built with ``F.aggregate`` / ``F.zip_with`` —
JVM-side, codegen'd, no Python.  Computation is pinned to DOUBLE so the
DuckDB oracle (``list_cosine_similarity`` over ``DOUBLE[]``) agrees to
~1e-15; query surfaces round to 6 decimals before comparing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vec_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def vec_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def synthetic_embeddings(
    spark,
    n: int,
    dim: int = 16,
    n_clusters: int = 8,
    noise: float = 0.25,
    seed: int = 0,
    num_partitions: int | None = None,
):
    """Seeded, cluster-structured unit embeddings — the test corpus
    generator for ANN/dedup at any scale.

    Each row draws a cluster id, then ``centroid(cluster) + noise·ε``
    per dimension, L2-normalized.  Everything is built from
    ``xxhash64(id, dim_idx, seed)``-derived uniforms via Box–Muller —
    pure Catalyst (transform over ``sequence``), no Python, fully
    reproducible under repartitioning: the 100 TB generation discipline
    of ``functions.seeded`` applied to array columns.

    Returns columns: ``vec_id``, ``cluster``, ``embedding``
    (``array<double>``).
    """
    from pyspark.sql import functions as F

    df = (
        spark.range(0, n, 1, num_partitions)
        if num_partitions
        else spark.range(n)
    )

    cluster = (F.abs(F.xxhash64(F.col("id"), F.lit("cluster"), F.lit(seed))) % n_clusters)
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    # per-dim value = cluster-keyed centroid in (-1,1) + noise·N(0,1),
    # the normal drawn by Box–Muller from two hash-uniforms
    raw = F.transform(
        dims,
        lambda i: (
            (F.abs(F.xxhash64(F.col("cluster"), F.lit("centroid"), i, F.lit(seed)))
             % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0 * 2 - 1
        )
        + noise
        * F.sqrt(-2 * F.log(
            (F.abs(F.xxhash64(F.col("vec_id"), i, F.lit("u1"), F.lit(seed)))
             % F.lit(1_000_000_007) + 1).cast("double") / 1_000_000_008.0))
        * F.cos(
            2 * 3.141592653589793
            * ((F.abs(F.xxhash64(F.col("vec_id"), i, F.lit("u2"), F.lit(seed)))
                % F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0)
        ),
    )
    df = df.select(F.col("id").alias("vec_id"), cluster.alias("cluster")).withColumn(
        "raw", raw
    )
    # the norm must be a PROJECTED column: embedded inside the divide
    # transform it would re-run the O(dim) aggregate per element
    # (Catalyst does no CSE across a lambda boundary — O(dim²)/row)
    df = df.withColumn(
        "__nrm",
        F.sqrt(F.aggregate(F.col("raw"), F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    return df.select(
        "vec_id",
        "cluster",
        F.transform(F.col("raw"), lambda x: x / F.col("__nrm")).alias("embedding"),
    )


def quantize_int8(df, vec_col: str = "embedding", codes_col: str = "codes", scale_col: str = "sc"):
    """Symmetric per-vector int8 quantization — the storage-side op a
    100 TB embedding pipeline runs before writing vectors: per-vector
    ``scale = max|v| / 127``, ``code_i = floor(v_i/scale + 0.5)``,
    always in [-127, 127] (|v_i/scale| <= 127 and floor(±127 + 0.5)
    stays inside).  Appends ``scale_col`` (double) and ``codes_col``
    (array<long>, int8-ranged) to ``df``; reconstruction
    ``code_i·scale`` is within scale/2 per element by construction.

    Row-local Catalyst array ops — no shuffle, no Python.  The rounding
    is ``floor(x + 0.5)``, NOT ``round(x)``: Spark's HALF_UP and
    DuckDB's double rounding can break .5 ties differently, while
    x + 0.5 then floor is the identical IEEE op sequence in both
    engines, so quantized codes are BIT-EXACT cross-engine.  An
    all-zero vector (scale 0) quantizes to all-zero codes."""
    staged = df.withColumn(
        "__e", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).withColumn(
        scale_col, F.array_max(F.transform("__e", F.abs)) / F.lit(127.0)
    )
    zero = F.transform("__e", lambda x: F.lit(0).cast("long"))
    q = F.transform(
        "__e", lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("long")
    )
    return staged.withColumn(
        codes_col, F.when(F.col(scale_col) == 0, zero).otherwise(q)
    ).drop("__e")


def dequantize_int8(codes: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_int8`: ``code_i · scale`` per element."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def normalize_embeddings_arrow(df, col: str = "embedding"):
    """L2-normalize an ``array<float>`` column via **mapInArrow** — the
    zero-copy path: each Arrow batch's list column is one flat values
    buffer + offsets, so the whole batch normalizes with two NumPy
    ops (``reduceat`` on the squares, then one divide) and never
    materializes python objects or per-row pandas Series.  Schema is
    preserved (same column order/types)."""

    def normalize(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            idx = b.schema.get_field_index(col)
            arr = b.column(idx)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # raw child buffer sliced by the offset span: exact alignment
            # with offsets even for sliced arrays and null rows (flatten()
            # would skip null rows' values and misalign)
            offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            base, end = offsets[0], offsets[-1]
            rel = offsets - base
            vals = (
                arr.values.to_numpy(zero_copy_only=False).astype(np.float64)[base:end]
            )
            starts, lens = rel[:-1], np.diff(rel)
            if len(vals):
                # clamp: a trailing empty/null row has start == len(vals),
                # which reduceat rejects; the garbage slot it produces is
                # masked by lens > 0 below
                norms = np.sqrt(
                    np.add.reduceat(vals * vals, np.minimum(starts, len(vals) - 1))
                )
            else:
                norms = np.zeros(len(starts))
            safe = np.where(lens > 0, np.maximum(norms, 1e-300), 1.0)
            scaled = vals / np.repeat(safe, lens)
            valid = arr.is_valid().to_numpy(zero_copy_only=False)
            out = pa.ListArray.from_arrays(
                pa.array(rel.astype(np.int32), type=pa.int32()),
                pa.array(scaled.astype(np.float32), type=pa.float32()),
                # mask=True marks NULL rows — without it from_arrays
                # silently rewrites every NULL embedding as []
                mask=pa.array(~valid),
            )
            yield b.set_column(idx, b.schema.field(idx), out)

    return df.mapInArrow(normalize, df.schema)
