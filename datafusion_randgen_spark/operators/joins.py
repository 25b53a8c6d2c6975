"""Joins Spark lacks natively: as-of join and bounded range (interval)
join — both expressed as compositions of built-in operators so Catalyst
keeps optimizing them (SURVEY.md §2.C: joins are absent in the reference;
these serve the north-star pipeline surface).

Scale design:

* **as-of join** — the union-and-carry-forward trick: tag left/right
  rows, union, sort within (keys, time) partitions, carry the last right
  row forward with ``last(..., ignorenulls)`` over an unbounded-preceding
  window, keep left rows.  ONE shuffle on the join keys (the window's
  partitionBy), versus a naive inequality join's O(n·m) expansion.
  Matches DuckDB's ``ASOF JOIN`` semantics: greatest right.ts <= left.ts.
* **range join** — bucketize the range key to ``bucket_width``; pairs
  within ``max_gap`` must sit in the same or adjacent bucket, so the
  cross product collapses to an equi-join on (keys, bucket) over 2
  bucket offsets, then an exact filter.  Shuffle is linear in rows;
  bucket width tunes the candidate blow-up factor.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_time <= left.left_time``, per ``on`` group.

    Right-side ties on the timestamp resolve to the row that sorts last
    (matching DuckDB ASOF JOIN's arbitrary-among-equals, then pinned
    deterministic by ordering on the value columns as final sort keys).
    """
    rrow = F.struct(*[F.col(c) for c in right_values]).alias("__rrow")
    lt = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None)
        .cast(right.select(rrow).schema["__rrow"].dataType)
        .alias("__rrow"),
    )
    rt = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__lrow"].dataType).alias("__lrow"),
        rrow,
    )
    unioned = lt.unionByName(rt)
    # right rows (__is_left=0) sort before left rows at equal timestamps,
    # so a right row AT the left row's timestamp is visible to it (<=).
    # The carried payload is ONE struct per right row — per-column
    # last(ignorenulls) would stitch together values from different
    # right rows when some right_values are NULL; a struct is non-null
    # for every right row (even all-NULL fields), so the winner is
    # atomic.  The trailing __rrow sort key pins which equal-timestamp
    # right row wins (the one sorting last) — without it the result is
    # partitioning-dependent.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left"), F.col("__rrow"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__is_left",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w).alias("__rrow"),
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rrow.{c}").alias(f"{c}{suffix}") for c in right_values],
    )
    return out


def range_self_join(
    df: DataFrame,
    on: Sequence[str],
    time_col: str,
    max_gap_seconds: float,
    id_col: str,
) -> DataFrame:
    """All pairs (a, b) in the same ``on`` group with
    ``0 < b.time - a.time <= max_gap_seconds`` — via time-bucket
    equi-join, not an inequality cross join.

    Returns (on…, id_a, id_b, gap_us) — the gap in integer microseconds
    (exact; float seconds would round differently across engines).
    """
    bucket = F.floor(F.unix_micros(F.col(time_col)) / F.lit(int(max_gap_seconds * 1_000_000)))
    base = df.select(
        *on, F.col(id_col).alias("id"), F.col(time_col).alias("t"), bucket.alias("b")
    )
    # candidate buckets: b and b+1 (a pair within max_gap spans at most
    # one bucket boundary) — 2× row expansion instead of O(n²).
    probe = base.select(
        *on, "id", "t", F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("b")
    )
    a, p = base.alias("a"), probe.alias("p")
    cond = (F.col("a.b") == F.col("p.b")) & (F.col("a.id") != F.col("p.id"))
    for c in on:
        cond = cond & (F.col(f"a.{c}") == F.col(f"p.{c}"))
    gap_us = F.unix_micros(F.col("a.t")) - F.unix_micros(F.col("p.t"))
    return (
        a.join(p, cond)
        .withColumn("gap_us", gap_us)
        .filter((F.col("gap_us") > 0) & (F.col("gap_us") <= int(max_gap_seconds * 1_000_000)))
        .select(
            *[F.col(f"a.{c}").alias(c) for c in on],
            F.col("p.id").alias("id_a"),
            F.col("a.id").alias("id_b"),
            F.col("gap_us"),
        )
        .distinct()
    )


def sessionize(
    df: DataFrame,
    on: Sequence[str],
    time_col: str,
    gap_minutes: float,
    agg_value: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap since the previous event in the group exceeds ``gap_minutes``.

    Returns one row per session: (on…, session_id, session_start,
    session_end, n_events[, sum_value]).  One shuffle on ``on``.
    """
    w = Window.partitionBy(*on).orderBy(time_col)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    flagged = df.withColumn(
        "__new",
        (
            F.unix_micros(F.col(time_col))
            - F.unix_micros(F.lag(time_col).over(w))
            > gap_us
        )
        .cast("int")
        .alias("__new"),
    ).withColumn("__new", F.coalesce("__new", F.lit(1)))
    sessions = flagged.withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    aggs = [
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if agg_value:
        aggs.append(F.round(F.sum(agg_value), 6).alias("sum_value"))
    return sessions.groupBy(*on, "session_id").agg(*aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: salt the (large, skewed) fact side with a
    uniform salt in ``[0, n_salts)`` and replicate the dim side once per
    salt, so one hot key's rows spread over ``n_salts`` shuffle
    partitions instead of hammering one reducer.

    Semantically identical to ``fact.join(dim, on, how)`` for inner /
    left joins keyed on the fact side.  AQE's skew-join split handles
    moderate skew automatically; explicit salting is the tool when one
    key alone exceeds an executor (zipf-style synthetic keys, §north-star)
    or when a deterministic layout is needed.  Cost: dim side is
    duplicated ``n_salts``× (keep it the broadcast-sized side).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join: unsupported how={how!r} (fact-keyed joins only)")
    keys = [on] if isinstance(on, str) else list(on)
    # Salt off a hash of the key columns plus spark_partition_id so rows
    # of the SAME hot key still fan out (a pure key hash would not split
    # it); any assignment is correct, spread is all that matters.
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return f.join(d, [*keys, "__salt"], how).drop("__salt")


def cogrouped_asof_align(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """As-of alignment via **cogrouped applyInPandas** — the imperative
    counterpart of :func:`asof_join` for when per-key logic outgrows
    window expressions (model-feature alignment, custom tolerance
    rules, interpolation).

    ``left.groupBy(on).cogroup(right.groupBy(on))`` ships BOTH sides of
    each key to one task as two Arrow-backed pandas frames — one
    shuffle per side, never a cross product — and ``pd.merge_asof``
    does the per-key backward scan vectorized.  Output: every left row
    plus ``right_ts`` = greatest right.ts <= left.ts for that key.
    """
    import pandas as pd

    out_schema = f"{on} long, left_ts timestamp, right_ts timestamp"

    def align(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # Catalyst prunes cogroup input columns to what the FINAL query
        # reads (a bare count() ships only the key), so never assume a
        # column survived — preserve row cardinality and emit NaT for
        # what can't be computed.
        if l.empty:
            return pd.DataFrame(
                {
                    on: pd.Series(dtype="int64"),
                    "left_ts": pd.Series(dtype="datetime64[us]"),
                    "right_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
        if ts not in l.columns:
            return pd.DataFrame(
                {on: l[on], "left_ts": pd.NaT, "right_ts": pd.NaT}
            )
        l = l.sort_values(ts)
        out = pd.DataFrame({on: l[on], "left_ts": l[ts]})
        if r.empty or ts not in r.columns:
            out["right_ts"] = pd.NaT
            return out
        r = r.sort_values(ts)
        merged = pd.merge_asof(
            l[[ts]].rename(columns={ts: "left_ts"}),
            r[[ts]].rename(columns={ts: "right_ts"}),
            left_on="left_ts",
            right_on="right_ts",
            direction="backward",
        )
        out["right_ts"] = merged["right_ts"].values
        return out

    return (
        left.select(on, ts)
        .groupBy(on)
        .cogroup(right.select(on, ts).groupBy(on))
        .applyInPandas(align, schema=out_schema)
    )


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE INTO without a table format: full-outer join on ``keys``,
    source wins where matched, unmatched rows pass through from either
    side (WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT with
    all-column set semantics).

    This is the snapshot-upsert shape for plain-parquet pipelines —
    Spark lacks ``MERGE`` on files, but a single shuffle-on-key full
    outer join expresses it exactly; at 100 TB both sides co-partition
    on the merge key and AQE picks the join strategy (broadcast when
    the delta is small)."""
    t = target.alias("t")
    # a non-null presence marker (not per-column coalesce): MERGE's
    # "source wins" must take the WHOLE source row when matched — a
    # coalesce per column would keep the stale target value whenever a
    # source field is legitimately NULL (updating a field to NULL is a
    # standard upsert)
    s = source.withColumn("__src", F.lit(1)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    merged = t.join(s, cond, "full_outer")
    cols = [
        F.when(F.col("s.__src").isNotNull(), F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in target.columns
    ]
    return merged.select(*cols)
