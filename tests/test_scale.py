"""operators.scale.global_cumsum: the distributed two-phase prefix sum
must be BIT-identical to the single-partition window form, and its plan
must not serialize the input through one task."""

from __future__ import annotations

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
