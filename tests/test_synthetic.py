"""Unit tests: new distributions, the declarative synthetic-table
generator (volatile + seeded), the parquet sink, and IVF ANN."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_randgen_spark.functions import exprs
from datafusion_randgen_spark.sources.synthetic import synthetic_table, write_synthetic


SPEC = {
    "user_id": {"kind": "int64_uniform", "lo": 1, "hi": 1000},
    "score": {"kind": "float64_normal", "mean": 5.0, "std": 2.0},
    "u": {"kind": "float64_uniform", "lo": -1.0, "hi": 1.0},
    "rate_draw": {"kind": "float64_exponential", "rate": 2.0},
    "log_draw": {"kind": "float64_lognormal", "mu": 0.0, "sigma": 0.5},
    "flag": {"kind": "bool_bernoulli", "p": 0.25},
    "joined_ts": {"kind": "timestamp_uniform", "lo": "2024-01-01 00:00:00", "hi": "2024-06-30 23:59:59"},
    "joined_d": {"kind": "date_uniform", "lo": "2024-01-01", "hi": "2024-12-31"},
    "hot": {"kind": "zipf", "n": 50, "s": 1.5},
    "country": {"kind": "element_from_weighted", "values": ["US", "DE", "IN"], "weights": [5, 2, 3]},
    "label": {"kind": "element_from", "values": ["x", "y", "z"]},
    "name": {"kind": "string_alpha", "length": 8},
}


@pytest.mark.parametrize("seed", [None, 42])
def test_synthetic_table_all_kinds(spark, seed):
    df = synthetic_table(spark, 5000, SPEC, seed=seed, num_partitions=4)
    row = df.select(
        F.count("*").alias("n"),
        F.count_if(~F.col("user_id").between(1, 1000)).alias("bad_uid"),
        F.count_if(F.col("rate_draw") < 0).alias("bad_exp"),
        F.count_if(F.col("log_draw") <= 0).alias("bad_logn"),
        F.count_if(~F.col("hot").between(1, 50)).alias("bad_zipf"),
        F.count_if(~F.col("country").isin("US", "DE", "IN")).alias("bad_country"),
        F.count_if(~F.col("label").isin("x", "y", "z")).alias("bad_label"),
        F.count_if(F.length("name") != 8).alias("bad_name"),
        F.count_if(F.col("name").rlike("^[a-z]{8}$") == False).alias("bad_alpha"),  # noqa: E712
        F.avg(F.col("flag").cast("double")).alias("p_flag"),
        F.count_if(
            ~F.col("joined_d").between(F.lit("2024-01-01"), F.lit("2024-12-31"))
        ).alias("bad_date"),
    ).collect()[0]
    assert row.n == 5000
    for field in ("bad_uid", "bad_exp", "bad_logn", "bad_zipf", "bad_country",
                  "bad_label", "bad_name", "bad_alpha", "bad_date"):
        assert getattr(row, field) == 0, field
    assert abs(row.p_flag - 0.25) < 0.05


def test_synthetic_seeded_is_reproducible_across_partitioning(spark):
    a = synthetic_table(spark, 3000, SPEC, seed=9, num_partitions=3)
    b = synthetic_table(spark, 3000, SPEC, seed=9, num_partitions=11)
    mism = (
        a.alias("a").join(b.alias("b"), "id")
        .filter(
            (F.col("a.user_id") != F.col("b.user_id"))
            | (F.col("a.score") != F.col("b.score"))
            | (F.col("a.name") != F.col("b.name"))
            | (F.col("a.country") != F.col("b.country"))
            | (F.col("a.joined_ts") != F.col("b.joined_ts"))
        )
        .count()
    )
    assert mism == 0


def test_synthetic_volatile_differs_across_runs(spark):
    a = synthetic_table(spark, 1000, {"v": {"kind": "int64_uniform", "lo": 1, "hi": 10**12}})
    matches = (
        a.alias("a").join(
            synthetic_table(spark, 1000, {"v": {"kind": "int64_uniform", "lo": 1, "hi": 10**12}}).alias("b"),
            "id",
        )
        .filter(F.col("a.v") == F.col("b.v"))
        .count()
    )
    assert matches < 5  # independent draws over a 1e12 domain


def test_write_synthetic_partitioned_roundtrip(spark, tmp_path):
    spec = {
        "v": {"kind": "int64_uniform", "lo": 1, "hi": 100},
        "part": {"kind": "element_from", "values": ["p1", "p2", "p3"]},
    }
    path = str(tmp_path / "sink")
    write_synthetic(spark, path, 2000, spec, seed=3, num_partitions=2, partition_by=["part"])
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert set(back.columns) == {"id", "v", "part"}
    # partition pruning reaches the file listing: one partition dir scanned
    pruned = back.filter(F.col("part") == "p1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan


def test_zipf_is_head_heavy(spark):
    x = spark.range(0, 50000).select(exprs.int64_zipf_expr(F.lit(100), F.lit(1.5)).alias("x"))
    freq = {r.x: r.n for r in x.groupBy("x").agg(F.count("*").alias("n")).collect()}
    assert max(freq, key=freq.get) == 1
    # P(1)≈0.39, P(10)≈0.012, P(90)≈0.0005 at s=1.5, n=100 — wide margins
    assert freq[1] > 10 * freq.get(10, 0) > 10 * freq.get(90, 0)


def test_exponential_moments(spark):
    x = spark.range(0, 200000).select(exprs.float64_exponential_expr(F.lit(4.0)).alias("x"))
    row = x.select(F.avg("x").alias("m"), F.stddev("x").alias("s")).collect()[0]
    assert abs(row.m - 0.25) < 0.01
    assert abs(row.s - 0.25) < 0.01


def test_weighted_element_null_and_errors():
    with pytest.raises(ValueError):
        exprs.element_from_weighted_expr(["a"], [1.0, 2.0])
    with pytest.raises(ValueError):
        exprs.element_from_weighted_expr([], [])
    with pytest.raises(ValueError):
        exprs.element_from_weighted_expr(["a", "b"], [-1.0, 1.0])


def test_poisson_parity_udf(spark):
    from datafusion_randgen_spark import add_udfs

    add_udfs(spark)
    row = spark.sql(
        """
        SELECT count(*) AS n, avg(x) AS m, var_samp(x) AS v,
               count_if(x IS NULL) AS nn
        FROM (SELECT randgen_int64_poisson(3.0) AS x FROM range(1, 50001))
        """
    ).collect()[0]
    assert row.n == 50000 and row.nn == 0
    assert abs(row.m - 3.0) < 0.1 and abs(row.v - 3.0) < 0.25
    # null propagation
    nulls = spark.sql(
        "SELECT count_if(x IS NULL) AS nn FROM "
        "(SELECT randgen_int64_poisson(IF(id % 2 = 0, NULL, 3.0)) AS x FROM range(1, 101))"
    ).collect()[0]
    assert nulls.nn == 50


def test_ivf_ann_recall_beats_half(spark):
    from datafusion_randgen_spark.operators import similarity
    from datafusion_randgen_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, queries_df, k=5).select("query_id", "neighbor_id")
    approx = similarity.ivf_ann_topk(emb, queries_df, k=5, n_clusters=8, n_probe=4)
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    assert total == 50
    assert hits / total >= 0.5
    # deterministic: second run identical
    again = similarity.ivf_ann_topk(emb, queries_df, k=5, n_clusters=8, n_probe=4)
    assert sorted(map(tuple, approx.collect())) == sorted(map(tuple, again.collect()))


def test_brute_force_topk_matches_exact_definition(spark):
    """The mapInPandas top-k must equal the naive crossJoin ranking."""
    from datafusion_randgen_spark.operators import similarity
    from datafusion_randgen_spark.functions.vectors import cosine_similarity
    from datafusion_randgen_spark.sources import load_table
    from pyspark.sql import Window

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    got = similarity.brute_force_topk(emb, q, k=3)
    naive = (
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
        .crossJoin(q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
            ),
        )
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


@pytest.mark.parametrize("seed", [None, 42])
def test_string_alpha_length_256_uniformish(spark, seed):
    """Long spec strings must neither blow up the expression tree
    (O(length/block) exprs, not O(length)) nor skew the alphabet: at
    length 256 × 2000 rows every letter should appear with frequency
    1/26 ± a generous margin, and chars at block boundaries (pos 12/13)
    must be independent draws."""
    df = synthetic_table(
        spark, 2000, {"s": {"kind": "string_alpha", "length": 256}}, seed=seed
    )
    row = df.select(
        F.count_if(F.length("s") != 256).alias("bad_len"),
        F.count_if(F.col("s").rlike("^[a-z]{256}$") == False).alias("bad_alpha"),  # noqa: E712
    ).collect()[0]
    assert row.bad_len == 0 and row.bad_alpha == 0
    freq = (
        df.select(F.explode(F.split("s", "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("c")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in freq)
    assert len(freq) == 26
    for r in freq:
        assert abs(r["count"] / total - 1 / 26) < 0.01, (r["c"], r["count"])


def test_string_alpha_seeded_reproducible_and_plan_bounded(spark):
    a = synthetic_table(spark, 100, {"s": {"kind": "string_alpha", "length": 256}}, seed=3)
    b = synthetic_table(spark, 100, {"s": {"kind": "string_alpha", "length": 256}}, seed=3)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # 256 chars = 22 hash blocks; the analyzed plan must stay small —
    # the old per-char form produced >256 substring(concat(...)) nodes
    plan = a._jdf.queryExecution().analyzed().toString()
    assert plan.count("xxhash64") <= 30


def test_zipf_s_equals_one_limit(spark):
    """s=1 is a removable singularity of the inverse CDF (limit n^u) —
    both the seeded generator and the UDTF must handle it instead of
    dividing by zero."""
    df = synthetic_table(spark, 5000, {"z": {"kind": "zipf", "n": 100, "s": 1.0}}, seed=5)
    row = df.select(
        F.count_if(~F.col("z").between(1, 100)).alias("oob"),
        F.count_if(F.col("z") == 1).alias("head"),
        F.count_if(F.col("z") == 50).alias("mid"),
    ).collect()[0]
    assert row.oob == 0 and row.head > row.mid > 0
    from datafusion_randgen_spark import add_udfs

    add_udfs(spark)
    rows = spark.sql(
        "SELECT min(z) lo, max(z) hi, count_if(z = 1) head FROM "
        "randgen_table(5000, 'z:zipf:100:1.0', 5)"
    ).collect()[0]
    assert rows.lo >= 1 and rows.hi <= 100 and rows.head > 50


def test_seeded_weighted_validates_like_volatile(spark):
    """Seed-mode parity: the guards must not depend on whether the spec
    runs volatile or seeded (zip() would silently truncate a mismatch
    into a wrong distribution)."""
    bad = {"c": {"kind": "element_from_weighted", "values": ["a", "b", "c"], "weights": [1, 1]}}
    for seed in (None, 42):
        with pytest.raises(ValueError, match="same nonzero length"):
            synthetic_table(spark, 10, bad, seed=seed)
    zero = {"c": {"kind": "element_from_weighted", "values": ["a"], "weights": [0]}}
    for seed in (None, 42):
        with pytest.raises(ValueError, match="positive sum"):
            synthetic_table(spark, 10, zero, seed=seed)


def test_seeded_exponential_validates_rate(spark):
    with pytest.raises(Exception, match="rate"):
        synthetic_table(
            spark, 10, {"x": {"kind": "float64_exponential", "rate": 0}}, seed=1
        ).collect()


def test_zipf_s_one_works_in_both_seed_modes(spark):
    for seed in (None, 7):
        row = (
            synthetic_table(spark, 2000, {"z": {"kind": "zipf", "n": 50, "s": 1.0}}, seed=seed)
            .select(F.count_if(~F.col("z").between(1, 50)).alias("oob"))
            .collect()[0]
        )
        assert row.oob == 0


def test_long_string_columns_are_independent(spark):
    """Two adjacent string_alpha columns must not share hash streams
    even at lengths where block indexes cross old salt strides."""
    df = synthetic_table(
        spark, 50,
        {"a": {"kind": "string_alpha", "length": 24},
         "b": {"kind": "string_alpha", "length": 24}},
        seed=3,
    )
    same = df.filter(
        (F.col("a") == F.col("b"))
        | (F.substring("a", 1, 12) == F.substring("b", 1, 12))
    ).count()
    assert same == 0
