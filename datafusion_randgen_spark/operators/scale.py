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

__all__ = [
    "global_cumsum",
    "global_running_max",
    "global_ntile",
    "global_ntile_multi",
    "global_row_number",
    "exact_percentiles",
]


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
    # one lightweight stats pass; 1% relative error only skews bucket
    # BALANCE, never assignment consistency.  NULL order keys sort first
    # under the window form (ASC NULLS FIRST) and are routed to the
    # first bucket inside _range_bucket.
    bucketed = _range_bucket(df, order_col, num_buckets)

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


def _range_bucket(df: DataFrame, order_col: str, num_buckets: int | None):
    """Assign each row a range bucket on ``order_col`` (approxQuantile
    boundaries; ties never split across buckets because assignment is a
    pure function of the value).  Shared by the global_* primitives.

    CALLER CONTRACT: ``order_col`` should be a cheap (scan or
    aggregate-output) column.  The bucket expression compares it once
    per boundary (~num_buckets times per row) and Catalyst has no CSE
    across those comparisons — a computed column built from an
    expensive expression gets duplicated into every comparison
    (measured 13s → 2.7s on p_curriculum_order by checkpointing the
    scored frame first).  Also note approxQuantile is an EAGER stats
    pass: it executes the input subtree once before the main plan —
    ``localCheckpoint(eager=True)`` the input when it is itself an
    expensive pipeline."""
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    n = max(1, n)
    if n > 1:
        qs = [i / n for i in range(1, n)]
        bounds = sorted(set(df.stat.approxQuantile(order_col, qs, 0.01)))
    else:
        bounds = []
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(order_col) > F.lit(b)).cast("int")
    bucket = F.when(F.col(order_col).isNull(), F.lit(0)).otherwise(bucket)
    return df.withColumn("__bucket", bucket)


def global_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_max",
    num_buckets: int | None = None,
) -> DataFrame:
    """STRICT-exclusive running max: for each row, the max of
    ``value_col`` over all rows with ``order_col`` STRICTLY less than
    this row's — the distributed form of
    ``max(value) OVER (ORDER BY order_col
    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``, which
    Catalyst otherwise plans as Exchange SinglePartition over the whole
    input.  Rows with no strictly-smaller predecessor get NULL, exactly
    like the empty window frame.

    Same two-phase shape as :func:`global_cumsum`: range-bucket on the
    order key, bucket-local strict RANGE window in parallel, then
    prefix-max of per-bucket maxima over the bucket-count-sized frame,
    broadcast back.  Strictness across buckets is free: every row in an
    earlier bucket has ``order_col <= boundary <`` every row in a later
    bucket (equal keys can never straddle a boundary because assignment
    is a pure function of the value).

    Preconditions: ``order_col`` numeric non-NULL (RANGE frame
    requirement, same as the single-window form); ``value_col`` any
    ordered type (max is order-based, so dates/timestamps work)."""
    bucketed = _range_bucket(df, order_col, num_buckets)
    local_w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("__local_max", F.max(value_col).over(local_w))
    # per-bucket max derived FROM THE WINDOW OUTPUT (inclusive running
    # max = greatest(strict frame, current row); its bucket max is the
    # bucket max) → Aggregate(Window(Exchange)) reuses the identical
    # hash exchange, scanning + shuffling the input once.  A plain
    # max(value) would let Catalyst prune the Window and push a partial
    # aggregate under its own exchange — second scan, no reuse.
    totals = local.groupBy("__bucket").agg(
        F.max(F.greatest("__local_max", value_col)).alias("__tot")
    )
    off_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket", F.max("__tot").over(off_w).alias("__off")
    )
    # greatest() skips NULLs (empty local frame / first bucket), exactly
    # the semantics the single global frame would produce
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.greatest("__local_max", "__off"))
        .drop("__bucket", "__local_max", "__off")
    )


def global_ntile(
    df: DataFrame,
    sort_col: str,
    tiebreak_col: str,
    n_tiles: int,
    out_col: str,
    num_buckets: int | None = None,
) -> DataFrame:
    """EXACT ``ntile(n) OVER (ORDER BY sort_col, tiebreak_col)`` without
    the Exchange SinglePartition that the unpartitioned window plans.

    Two-phase: range-bucket on ``sort_col`` (ties stay together; the
    ``tiebreak_col`` only orders within a bucket), bucket-local
    ``row_number`` in parallel, prefix row-count offsets over the
    bucket-count-sized frame → exact global 0-based position ``i``;
    then SQL-standard ntile is a closed form of (i, n): with
    ``q = n div k`` and ``r = n mod k``, the first ``r`` tiles hold
    ``q+1`` rows, so
    ``tile = i < r*(q+1) ? i div (q+1) + 1 : r + (i - r*(q+1)) div q + 1``.

    Preconditions: ``sort_col`` numeric non-NULL; (sort_col,
    tiebreak_col) unique (same determinism precondition the ntile
    window needs for a well-defined result).  For DESC order pass a
    negated sort key."""
    bucketed = _range_bucket(df, sort_col, num_buckets)
    local_w = Window.partitionBy("__bucket").orderBy(sort_col, tiebreak_col)
    local = bucketed.withColumn(
        "__rn", F.row_number().over(local_w).cast("long")
    )
    totals = local.groupBy("__bucket").agg(F.max("__rn").alias("__cnt"))
    off_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(
            Window.orderBy("__bucket").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n"),
    )
    i = F.col("__rn") - 1 + F.col("__off")  # exact global 0-based position
    k = F.lit(int(n_tiles))
    # IntegralDivide (`div`), not `/`: Spark's `/` on longs is IEEE
    # double division, which truncates past 2^53 and could mis-assign a
    # tile boundary at extreme cardinality (r5 advice) — `div` keeps the
    # closed form exact at any row count
    idiv = lambda a, b: F.call_function("div", a, b)  # noqa: E731
    q = idiv(F.col("__n"), k)
    r = F.col("__n") % k
    tile = F.when(
        i < r * (q + 1), idiv(i, q + 1) + 1
    ).otherwise(r + idiv(i - r * (q + 1), q) + 1)
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, tile.cast("long"))
        .drop("__bucket", "__rn", "__off", "__n")
    )


def global_ntile_multi(
    df: DataFrame,
    specs: list[tuple[str, str, int, int]],
    num_buckets: int | None = None,
) -> DataFrame:
    """Several exact :func:`global_ntile` scores over the SAME frame in
    one plan — ``specs`` is a list of ``(sort_col, tiebreak_col,
    n_tiles, out_col)``.

    Each score is a pure function of ``df`` alone, so (r20, guide
    §1.2/§2.4) all range-bucket boundaries come from ONE multi-column
    ``approxQuantile`` pass and every score's bucket totals derive from
    ``df`` directly — where chaining :func:`global_ntile` calls ran a
    separate eager stats pass per score over the growing joined frame
    and forced a materialization between scores (measured on sf0.1
    ``q_rfm_segmentation``: 3 stacked ntiles 3.56s/33 jobs → fused
    1.68s/13 jobs, identical rows).  The per-score exchanges (one
    bucket-local window each) chain inside the single plan.

    Same preconditions as :func:`global_ntile` per spec, plus the
    :func:`_range_bucket` caller contract: ``df`` should be a cheap
    frame — materialization-pin it first when upstream is expensive
    (the stats pass executes its subtree eagerly, and each score's
    totals re-derive from it)."""
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    n = max(1, n)
    if n > 1:
        qs = [i / n for i in range(1, n)]
        all_bounds = df.stat.approxQuantile([s[0] for s in specs], qs, 0.01)
    else:
        all_bounds = [[] for _ in specs]
    idiv = lambda a, b: F.call_function("div", a, b)  # noqa: E731  (exact, see global_ntile)
    out = df
    for (sort_col, tiebreak_col, n_tiles, out_col), raw in zip(
        specs, all_bounds
    ):
        bucket = F.lit(0)
        for b in sorted(set(raw)):
            bucket = bucket + (F.col(sort_col) > F.lit(b)).cast("int")
        bucket = F.when(F.col(sort_col).isNull(), F.lit(0)).otherwise(bucket)
        bcol, rncol = f"__bkt_{out_col}", f"__rn_{out_col}"
        local_w = Window.partitionBy(bcol).orderBy(sort_col, tiebreak_col)
        out = out.withColumn(bcol, bucket).withColumn(
            rncol, F.row_number().over(local_w).cast("long")
        )
        # totals from the INPUT frame (scores are independent of each
        # other), so the offsets subplan never nests the chained scores
        totals = (
            df.withColumn(bcol, bucket)
            .groupBy(bcol)
            .agg(F.count("*").alias("__cnt"))
        )
        off_w = Window.orderBy(bcol).rowsBetween(Window.unboundedPreceding, -1)
        offsets = totals.select(
            bcol,
            F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__off"),
            F.sum("__cnt").over(
                Window.orderBy(bcol).rangeBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("__n"),
        )
        i = F.col(rncol) - 1 + F.col("__off")
        k = F.lit(int(n_tiles))
        q = idiv(F.col("__n"), k)
        r = F.col("__n") % k
        tile = F.when(
            i < r * (q + 1), idiv(i, q + 1) + 1
        ).otherwise(r + idiv(i - r * (q + 1), q) + 1)
        out = (
            out.join(F.broadcast(offsets), bcol)
            .withColumn(out_col, tile.cast("long"))
            .drop(bcol, rncol, "__off", "__n")
        )
    return out


def global_row_number(
    df: DataFrame,
    sort_col: str,
    tiebreak_col: str,
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """EXACT ``row_number() OVER (ORDER BY sort_col, tiebreak_col)``
    without the Exchange SinglePartition the unpartitioned window plans
    — the r5-verdict fix for vocabulary-rank frames, where the "small"
    side is Heaps-law sublinear but still 10⁸–10⁹ rows at web scale.

    Same two-phase shape as :func:`global_ntile`'s position step:
    range-bucket on ``sort_col`` (ties never split across buckets —
    assignment is a pure function of the value; ``tiebreak_col`` only
    orders within a bucket), bucket-local ``row_number`` in parallel,
    then prefix row-count offsets over the bucket-count-sized totals
    frame, broadcast back.  The only SinglePartition exchange touches
    ``num_buckets`` rows.

    Preconditions: ``sort_col`` numeric non-NULL (range-bucket
    requirement); (sort_col, tiebreak_col) unique for a well-defined
    rank — the same determinism the single-window form needs.  For
    DESC order pass a negated sort key.  ``out_col`` is LONG (the
    window form emits INT; cast downstream if the schema contract
    needs it)."""
    bucketed = _range_bucket(df, sort_col, num_buckets)
    local_w = Window.partitionBy("__bucket").orderBy(sort_col, tiebreak_col)
    local = bucketed.withColumn(
        "__rn", F.row_number().over(local_w).cast("long")
    )
    # bucket row-count derived from the window output (max __rn), so
    # Aggregate(Window(Exchange)) reuses the identical __bucket hash
    # exchange — one scan + one shuffle (the global_cumsum trick)
    totals = local.groupBy("__bucket").agg(F.max("__rn").alias("__cnt"))
    off_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__rn") + F.col("__off"))
        .drop("__bucket", "__rn", "__off")
    )


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: list[float],
) -> DataFrame:
    """EXACT interpolated percentiles per group WITHOUT a per-group sort.

    ``percentile()`` (and DuckDB's ``quantile_cont``) buffer + sort every
    group's values inside one aggregate — memory-unbounded when a group
    holds billions of rows.  This computes the identical linear-
    interpolated quantile from a per-(group, value) count histogram:

    1. ``groupBy(group, value).count()`` — ONE map-side-combinable
       shuffle; the shuffled frame is (distinct values per group) rows,
       not corpus rows;
    2. cumulative counts over each group's histogram (window over the
       histogram, not the corpus);
    3. the continuous-quantile rank ``r = 1 + p*(n-1)`` needs the values
       at positions ``floor(r)``/``ceil(r)``: a histogram row with
       cumulative count ``c`` and count ``k`` covers positions
       ``(c-k, c]``, so each position lookup is a broadcast range join
       against a (groups × ps)-sized rank frame;
    4. interpolate ``lo + frac*(hi-lo)``.

    Precondition for the scale win: per-group distinct-value cardinality
    ≪ group size (prices, quantities, scores, token counts — the usual
    percentile targets).  For genuinely continuous columns, bucketize
    first (then this is the classic histogram-quantile with bounded
    error) or use ``percentile_approx``.  NULL values are ignored,
    matching ``percentile()`` / ``quantile_cont``; a group that is all
    NULL disappears from the output (the sort-based form returns NULL
    there instead).  Returns one row per (group, p):
    ``(group_col, p, pct_value)``.
    """
    df = df.filter(F.col(value_col).isNotNull())
    base = df.groupBy(group_col, value_col).agg(F.count("*").alias("__k"))
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hist = base.withColumn("__c", F.sum("__k").over(cum_w))
    # group sizes from the PRE-window histogram (sum of counts — no
    # window needed), so the totals subtree shares the histogram
    # shuffle via AQE stage reuse instead of re-running the cumulative
    # window (r20, guide §2.4)
    totals = base.groupBy(group_col).agg(F.sum("__k").alias("__n"))

    # (group, p, side) lookup frame: tiny — groups × len(ps) × 2 rows.
    # Both ordinal positions (floor/ceil of the continuous rank) ride
    # ONE side-tagged frame so a SINGLE broadcast range join resolves
    # lo and hi together — the pre-r20 form ran one join per side and
    # re-joined the two results, so the histogram pipeline appeared
    # twice more in the plan (measured on the two percentile entries:
    # see OPTIMIZATION_r20.md)
    p_lit = F.array(*[F.lit(float(p)) for p in ps])
    ranks = (
        totals.select(group_col, "__n", F.explode(p_lit).alias("p"))
        .withColumn("__r", F.lit(1.0) + F.col("p") * (F.col("__n") - 1))
        .withColumn("__frac", F.col("__r") - F.floor("__r"))
        .select(
            F.col(group_col).alias("__g"),
            "p",
            "__frac",
            F.explode(
                F.array(
                    F.struct(
                        F.floor("__r").cast("long").alias("__pos"),
                        F.lit("lo").alias("__side"),
                    ),
                    F.struct(
                        F.ceil("__r").cast("long").alias("__pos"),
                        F.lit("hi").alias("__side"),
                    ),
                )
            ).alias("__e"),
        )
        .select("__g", "p", "__frac", "__e.__pos", "__e.__side")
    )
    # value at ordinal pos = the histogram row covering it: a row with
    # cumulative count c and count k covers positions (c-k, c]
    looked = hist.join(
        F.broadcast(ranks),
        on=[
            F.col(group_col) == F.col("__g"),
            F.col("__pos") > F.col("__c") - F.col("__k"),
            F.col("__pos") <= F.col("__c"),
        ],
    ).select(
        group_col,
        "p",
        "__frac",
        "__side",
        F.col(value_col).cast("double").alias("__v"),
    )
    side_v = lambda s: F.max(F.when(F.col("__side") == s, F.col("__v")))  # noqa: E731
    return (
        looked.groupBy(group_col, "p")
        .agg(
            side_v("lo").alias("__lo"),
            side_v("hi").alias("__hi"),
            F.max("__frac").alias("__frac"),
        )
        .select(
            group_col,
            "p",
            (F.col("__lo") + F.col("__frac") * (F.col("__hi") - F.col("__lo"))).alias(
                "pct_value"
            ),
        )
    )
