"""operators.scale.global_cumsum: the distributed two-phase prefix sum
must be BIT-identical to the single-partition window form, and its plan
must not serialize the input through one task."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from datafusion_randgen_spark.operators import scale


def _reference_cumsum(df, order_col, value_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("cumsum", F.sum(value_col).over(w))


@pytest.mark.parametrize("num_buckets", [1, 3, 8])
def test_matches_single_window_uniform_keys(spark, num_buckets):
    df = spark.range(0, 1000, 1, 6).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("v")
    )
    got = {
        r.k: r.cumsum
        for r in scale.global_cumsum(df, "k", "v", num_buckets=num_buckets).collect()
    }
    want = {r.k: r.cumsum for r in _reference_cumsum(df, "k", "v").collect()}
    assert got == want


def test_matches_on_skewed_keys_and_negative_values(spark):
    # heavily skewed key distribution (quadratic gaps) + sign-mixed
    # values: bucket totals are NOT monotone, catching any max-based
    # shortcut in the offset computation
    rows = [Row(k=i * i, v=(-1) ** i * (i % 11 + 1)) for i in range(500)]
    df = spark.createDataFrame(rows).repartition(7)
    got = {r.k: r.cumsum for r in scale.global_cumsum(df, "k", "v").collect()}
    want = {r.k: r.cumsum for r in _reference_cumsum(df, "k", "v").collect()}
    assert got == want


def test_fractional_values_and_tiny_input(spark):
    df = spark.createDataFrame(
        [Row(k=1, v=0.5), Row(k=2, v=0.25), Row(k=3, v=0.125)]
    )
    out = {r.k: r.cumsum for r in scale.global_cumsum(df, "k", "v").collect()}
    assert out == {1: 0.5, 2: 0.75, 3: 0.875}


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert scale.global_cumsum(df, "k", "v").count() == 0


def test_plan_has_no_full_data_single_partition_sort(spark):
    """The ONLY SinglePartition exchange allowed is the one feeding the
    bucket-count-sized offsets frame; the main data path must be
    hash-clustered by bucket.  We check that the big input (100k rows)
    flows through a partitioned window, by asserting the result is
    right AND the number of SinglePartition exchanges is exactly 1
    (the tiny offsets window) — the naive form has it on the data path."""
    df = spark.range(0, 100_000, 1, 16).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    # static planning (AQE off) so ReuseExchange is visible in the plan
    # string; under AQE the same dedup happens via shuffle-stage reuse
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = scale.global_cumsum(df, "k", "v", num_buckets=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("SinglePartition") <= 1
    # the totals branch must hang off the SAME exchange as the window
    # branch — one scan + one shuffle of the input, not two
    assert "ReusedExchange" in plan
    # spot-check correctness at the tail
    tail = out.filter(F.col("k") == 99_999).collect()
    assert tail[0].cumsum == 100_000


# -------------------------------------------------------------------------
# exact_percentiles: histogram method must reproduce percentile() exactly
# -------------------------------------------------------------------------

def _pctl_reference(df, group_col, value_col, ps):
    rows = df.groupBy(group_col).agg(
        *[
            F.expr(f"percentile({value_col}, {p})").alias(f"p{i}")
            for i, p in enumerate(ps)
        ]
    ).collect()
    return {
        (r[group_col], p): r[f"p{i}"]
        for r in rows
        for i, p in enumerate(ps)
    }


@pytest.mark.parametrize("ps", [[0.5], [0.0, 0.25, 0.5, 0.75, 1.0]])
def test_exact_percentiles_match_sort_based(spark, ps):
    # 3 groups with different sizes/parities, heavy value duplication
    # (the histogram regime), including a size-1 group where every
    # percentile is the single value
    rows = (
        [Row(g="a", v=float(i % 7)) for i in range(101)]
        + [Row(g="b", v=float((i * 3) % 13)) for i in range(50)]
        + [Row(g="c", v=42.0)]
    )
    df = spark.createDataFrame(rows).repartition(5)
    got = {
        (r.g, r.p): r.pct_value
        for r in scale.exact_percentiles(df, "g", "v", ps).collect()
    }
    want = _pctl_reference(df, "g", "v", ps)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_exact_percentiles_negative_and_interpolated(spark):
    # even count -> the median interpolates between two DISTINCT values;
    # negatives exercise ordering
    df = spark.createDataFrame(
        [Row(g=1, v=-10.0), Row(g=1, v=-2.0), Row(g=1, v=4.0), Row(g=1, v=8.0)]
    )
    got = {
        r.p: r.pct_value
        for r in scale.exact_percentiles(df, "g", "v", [0.5]).collect()
    }
    assert got[0.5] == pytest.approx(1.0)  # (-2 + 4) / 2


def test_exact_percentiles_plan_no_corpus_sort(spark):
    """The corpus-sized frame must only flow through the histogram
    groupBy; windows and joins run on the histogram.  Assert no window
    operator consumes the raw input partitioning: every Window sits
    above the hash aggregate (i.e. the plan has exactly one exchange on
    the corpus path — the groupBy's)."""
    df = spark.range(0, 200_000, 1, 16).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 50).cast("double").alias("v")
    )
    out = scale.exact_percentiles(df, "g", "v", [0.5])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # sort-based percentile plans as an Aggregate over raw rows with a
    # `percentile` expression; the histogram form must not contain one
    assert "percentile" not in plan.lower()
    rows = {r.g: r.pct_value for r in out.collect()}
    assert set(rows) == {0, 1, 2}


def test_exact_percentiles_ignore_nulls_like_percentile(spark):
    # percentile() skips NULLs: [NULL, 1.0, 2.0] has median 1.5
    df = spark.createDataFrame(
        [Row(g=1, v=None), Row(g=1, v=1.0), Row(g=1, v=2.0)],
        "g int, v double",
    )
    got = {r.p: r.pct_value
           for r in scale.exact_percentiles(df, "g", "v", [0.0, 0.5]).collect()}
    assert got == {0.0: pytest.approx(1.0), 0.5: pytest.approx(1.5)}
    # an all-NULL group vanishes (documented deviation: sort-based
    # percentile would return a NULL row)
    df2 = spark.createDataFrame([Row(g=9, v=None)], "g int, v double")
    assert scale.exact_percentiles(df2, "g", "v", [0.5]).count() == 0


# -------------------------------------------------------------------------
# global_running_max: strict-exclusive distributed cummax must match the
# single-partition RANGE window exactly
# -------------------------------------------------------------------------

def _reference_running_max(df, order_col, value_col):
    w = Window.orderBy(order_col).rangeBetween(Window.unboundedPreceding, -1)
    return df.withColumn("running_max", F.max(value_col).over(w))


@pytest.mark.parametrize("num_buckets", [1, 3, 8])
def test_running_max_matches_single_window(spark, num_buckets):
    # non-monotone values + duplicate order keys: ties must share the
    # SAME strict-predecessor max (RANGE, not ROWS, semantics)
    df = spark.range(0, 2000, 1, 6).select(
        (F.col("id") % 500).alias("k"),  # each key appears 4x
        ((F.col("id") * 37) % 1000).alias("v"),
    )
    got = sorted(
        (r.k, r.v, r.running_max)
        for r in scale.global_running_max(
            df, "k", "v", num_buckets=num_buckets
        ).collect()
    )
    want = sorted(
        (r.k, r.v, r.running_max)
        for r in _reference_running_max(df, "k", "v").collect()
    )
    assert got == want
    # first key has no strict predecessor -> NULL, like the empty frame
    assert all(rm is None for k, _, rm in got if k == 0)


def test_running_max_dates(spark):
    df = spark.createDataFrame(
        [Row(k=10, d=datetime.date(2024, 3, 1)),
         Row(k=20, d=datetime.date(2024, 1, 1)),
         Row(k=30, d=datetime.date(2024, 2, 1))],
        "k long, d date",
    )
    got = {r.k: r.running_max
           for r in scale.global_running_max(df, "k", "d", num_buckets=2).collect()}
    assert got == {
        10: None,
        20: datetime.date(2024, 3, 1),
        30: datetime.date(2024, 3, 1),
    }


def test_running_max_plan_no_data_single_partition(spark):
    df = spark.range(0, 100_000, 1, 16).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("v")
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = scale.global_running_max(df, "k", "v", num_buckets=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("SinglePartition") <= 1  # only the tiny offsets frame
    assert "ReusedExchange" in plan
    tail = out.filter(F.col("k") == 99_999).collect()
    assert tail[0].running_max == 996


# -------------------------------------------------------------------------
# global_ntile: closed-form two-phase ntile must match ntile() exactly,
# including the uneven-remainder tile sizes
# -------------------------------------------------------------------------

@pytest.mark.parametrize("n_rows,n_tiles", [(1, 4), (3, 4), (103, 4), (1000, 7)])
def test_global_ntile_matches_window_ntile(spark, n_rows, n_tiles):
    df = spark.range(0, n_rows, 1, 5).select(
        ((F.col("id") * 131) % 89).alias("s"),  # duplicate sort keys
        F.col("id").alias("u"),
    )
    w = Window.orderBy("s", "u")
    want = {(r.s, r.u): r.t
            for r in df.select("s", "u", F.ntile(n_tiles).over(w).alias("t")).collect()}
    got = {(r.s, r.u): r.t
           for r in scale.global_ntile(df, "s", "u", n_tiles, "t").collect()}
    assert got == want


def test_global_ntile_desc_via_negated_key(spark):
    df = spark.range(0, 40, 1, 3).select(
        F.col("id").alias("f"), F.col("id").alias("u")
    )
    w = Window.orderBy(F.col("f").desc(), "u")
    want = {r.u: r.t
            for r in df.select("u", F.ntile(4).over(w).alias("t")).collect()}
    got = {r.u: r.t
           for r in scale.global_ntile(
               df.withColumn("nf", -F.col("f")), "nf", "u", 4, "t"
           ).collect()}
    assert got == want


def test_global_ntile_plan_no_data_single_partition(spark):
    df = spark.range(0, 100_000, 1, 16).select(
        F.col("id").alias("s"), F.col("id").alias("u")
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = scale.global_ntile(df, "s", "u", 4, "t", num_buckets=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("SinglePartition") <= 1
    counts = {r.t: r.n for r in out.groupBy("t").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 25_000, 2: 25_000, 3: 25_000, 4: 25_000}


@pytest.mark.parametrize("num_buckets", [1, 4, 9])
def test_global_row_number_matches_window(spark, num_buckets):
    """Duplicate sort keys + tiebreak: identical assignment to the
    unpartitioned row_number window, for any bucket count."""
    df = spark.range(0, 997, 1, 5).select(
        ((F.col("id") * 131) % 89).alias("s"),  # heavy duplicate keys
        F.col("id").alias("u"),
    )
    w = Window.orderBy("s", "u")
    want = {(r.s, r.u): r.rn
            for r in df.select("s", "u", F.row_number().over(w).alias("rn")).collect()}
    got = {(r.s, r.u): r.rn
           for r in scale.global_row_number(
               df, "s", "u", out_col="rn", num_buckets=num_buckets
           ).collect()}
    assert got == want


def test_global_row_number_desc_and_skewed_keys(spark):
    """DESC via negated key over quadratic-gap (skewed) sort values —
    boundary skew affects balance only, never assignment."""
    rows = [Row(f=i * i, u=i) for i in range(300)]
    df = spark.createDataFrame(rows).repartition(7)
    w = Window.orderBy(F.col("f").desc(), "u")
    want = {r.u: r.rn
            for r in df.select("u", F.row_number().over(w).alias("rn")).collect()}
    got = {r.u: r.rn
           for r in scale.global_row_number(
               df.withColumn("nf", -F.col("f")), "nf", "u", out_col="rn"
           ).collect()}
    assert got == want


def test_global_row_number_plan_no_data_single_partition(spark):
    df = spark.range(0, 100_000, 1, 16).select(
        F.col("id").alias("s"), F.col("id").alias("u")
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = scale.global_row_number(df, "s", "u", out_col="rn", num_buckets=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("SinglePartition") <= 1  # offsets frame only
    agg = out.agg(F.min("rn").alias("lo"), F.max("rn").alias("hi"),
                  F.countDistinct("rn").alias("nd")).first()
    assert (agg.lo, agg.hi, agg.nd) == (1, 100_000, 100_000)
