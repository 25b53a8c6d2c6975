"""Scale-out primitives for operations whose naive Spark form collapses
to a single partition.

The flagship here is :func:`global_cumsum`: a running total over a
GLOBAL row order.  The obvious ``Window.orderBy(key)`` form is correct
but serializes the whole input through ONE task (Catalyst plans
``Exchange SinglePartition`` under an unpartitioned ordered window) —
fine at sf0.1, fatal at 100 TB.  This module implements the classic
two-phase parallel prefix sum instead, entirely with DataFrame ops:

1. one light pass estimates bucket boundaries (``approxQuantile`` —
   Greenwald-Khanna, deterministic for a given input);
2. each row is assigned a range bucket with a codegen'd comparison
   chain (boundary skew affects balance only, never correctness);
3. ONE shuffle clusters by bucket; a bucket-local ordered window
   computes partial cumsums in parallel;
4. per-bucket totals (a bucket-count-sized frame) get prefix offsets
   via a window over that TINY frame, and are broadcast-joined back.

For integer/decimal value columns the result is bit-identical to the
single-partition window; for floating-point values it is identical up
to FP addition order (offset + bucket-local sum associates additions
differently than one sequential running sum — last-bit jitter, the
same caveat any parallel reduction carries).  Max partition size is
bounded by corpus/buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_cumsum"]


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Cumulative sum of ``value_col`` in ascending ``order_col`` order
    (inclusive of the current row), distributed over ``num_buckets``
    range buckets instead of one global sort partition.

    ``order_col`` must be numeric and unique (a rowid / offset key —
    the same precondition the single-window form needs for a
    well-defined per-row result).  Rows equal to a bucket boundary all
    land in the lower bucket, so no order inversion can cross buckets.
    """
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    n = max(1, n)

    if n > 1:
        qs = [i / n for i in range(1, n)]
        # one lightweight stats pass; 1% relative error only skews
        # bucket BALANCE, never assignment consistency
        bounds = sorted(set(df.stat.approxQuantile(order_col, qs, 0.01)))
    else:
        bounds = []

    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(order_col) > F.lit(b)).cast("int")
    # NULL order keys sort first under the window form (ASC NULLS FIRST),
    # so route them to the first bucket instead of letting a NULL bucket
    # key silently drop them in the offsets equi-join
    bucket = F.when(F.col(order_col).isNull(), F.lit(0)).otherwise(bucket)
    bucketed = df.withColumn("__bucket", bucket)

    local_w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("__local_cum", F.sum(value_col).over(local_w))

    # per-bucket total = the LAST row's inclusive local cumsum (max_by on
    # the order key — sign-safe, unlike max(cumsum)).  Deriving it from
    # the window output makes this branch Aggregate(Window(Exchange)) on
    # the IDENTICAL Exchange(hashpartitioning(__bucket)) the main branch
    # uses, so ReuseExchange scans + shuffles the input ONCE (a plain
    # groupBy(value) would push a partial aggregate below its own
    # exchange and defeat the reuse — verified in tests/test_scale.py)
    totals = local.groupBy("__bucket").agg(
        F.max_by("__local_cum", F.col(order_col)).alias("__tot")
    )
    # prefix offsets over the bucket-count-sized totals frame: the ONLY
    # single-partition window left, and it touches num_buckets rows
    off_w = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__tot").over(off_w), F.lit(0)).alias("__off"),
    )

    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__local_cum") + F.col("__off"))
        .drop("__bucket", "__local_cum", "__off")
    )
