"""UDTF (table function) and UDAF (grouped-agg pandas UDF) surfaces."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_randgen_spark import add_udfs
from datafusion_randgen_spark.functions.udaf import gmean, trimmed_mean_10
from datafusion_randgen_spark.sources import load_table


def test_udtf_series_inclusive_parity(spark):
    add_udfs(spark)
    rows = spark.sql("SELECT value FROM randgen_series(1, 100)").collect()
    vals = sorted(r.value for r in rows)
    assert vals == list(range(1, 101))  # inclusive like generate_series


def test_udtf_series_step_and_descending(spark):
    add_udfs(spark)
    up = [r.value for r in spark.sql("SELECT * FROM randgen_series(0, 10, 3)").collect()]
    assert sorted(up) == [0, 3, 6, 9]
    down = [r.value for r in spark.sql("SELECT * FROM randgen_series(5, 1, -2)").collect()]
    assert sorted(down) == [1, 3, 5]


def test_udtf_random_rows_bounds_and_nulls(spark):
    add_udfs(spark)
    row = spark.sql(
        """
        SELECT count(*) AS n, count_if(x NOT BETWEEN 1 AND 10) AS bad,
               count(DISTINCT x) AS nd
        FROM randgen_uniform_rows(5000, 1, 10)
        """
    ).collect()[0]
    assert row.n == 5000 and row.bad == 0 and row.nd == 10
    nulls = spark.sql("SELECT * FROM randgen_uniform_rows(10, 1, CAST(NULL AS BIGINT))").collect()
    assert len(nulls) == 10 and all(r.x is None for r in nulls)


def test_udaf_gmean_matches_closed_form(spark):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = {
        r.l_returnflag: r.g
        for r in li.groupBy("l_returnflag").agg(gmean(F.col("l_quantity")).alias("g")).collect()
    }
    expect = {
        r.l_returnflag: math.exp(r.m)
        for r in li.groupBy("l_returnflag")
        .agg(F.avg(F.log("l_quantity")).alias("m"))
        .collect()
    }
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k], rel=1e-9)


def test_udaf_trimmed_mean_trims_tails(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)] + [(1000.0,)], "x double")
    out = df.agg(trimmed_mean_10(F.col("x")).alias("t")).collect()[0].t
    # n=11, k=1: drop min(1.0) and max(1000.0) -> mean of 2..10
    assert out == pytest.approx(sum(range(2, 11)) / 9)


def test_udaf_sql_registration(spark):
    add_udfs(spark)
    row = spark.sql(
        "SELECT gmean(x) AS g FROM (SELECT CAST(id AS DOUBLE) AS x FROM range(1, 5))"
    ).collect()[0]
    assert row.g == pytest.approx((1 * 2 * 3 * 4) ** 0.25, rel=1e-9)


def test_python_datasource_unseeded_is_volatile(spark):
    def scan():
        return (
            spark.read.format("randgen")
            .option("rows", 5000)
            .option("partitions", 4)
            .option("lo", 0)
            .option("hi", 10**9)
            .load()
        )

    a = [r.x for r in scan().collect()]
    b = [r.x for r in scan().collect()]
    assert a != b  # no seed => fresh draws per scan, like Volatility::Volatile


def test_python_datasource_invalid_range_raises(spark):
    import pytest as _pytest

    with _pytest.raises(Exception, match="lo .* > hi"):
        spark.read.format("randgen").option("lo", 9).option("hi", 1).load().collect()


def test_python_datasource_split_count(spark):
    df = (
        spark.read.format("randgen")
        .option("rows", 1000)
        .option("partitions", 8)
        .option("seed", 1)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000


def test_udtf_table_full_grammar_schema(spark):
    """analyze() must type every spec kind: the SQL grammar now matches
    sources.synthetic one kind for one kind."""
    add_udfs(spark)
    df = spark.sql(
        """
        SELECT * FROM randgen_table(50,
          'a:int64_uniform:1:9, u:float64_uniform:0:1, g:float64_normal:0:1,
           e:float64_exponential:2.0, l:float64_lognormal:0:0.5,
           b:bool_bernoulli:0.5, z:zipf:100:1.3, c:element_from:p|q|r,
           w:element_from_weighted:p|q:1|9, s:string_alpha:8,
           t:timestamp_uniform:2024-01-01:2024-06-30,
           d:date_uniform:2024-01-01:2024-12-31', 7)
        """
    )
    dt = dict(df.dtypes)
    assert dt["a"] == "bigint" and dt["z"] == "bigint"
    assert dt["u"] == dt["g"] == dt["e"] == dt["l"] == "double"
    assert dt["b"] == "boolean"
    assert dt["c"] == dt["w"] == dt["s"] == "string"
    assert dt["t"] == "timestamp" and dt["d"] == "date"
    rows = df.collect()
    assert len(rows) == 50
    import datetime as _dt

    for r in rows:
        assert 1 <= r.z <= 100
        assert r.c in {"p", "q", "r"} and r.w in {"p", "q"}
        assert len(r.s) == 8 and r.s.isalpha() and r.s.islower()
        assert _dt.date(2024, 1, 1) <= r.d <= _dt.date(2024, 12, 31)
        assert _dt.datetime(2024, 1, 1) <= r.t <= _dt.datetime(2024, 6, 30)


def test_udtf_table_seeded_reproducible_new_kinds(spark):
    add_udfs(spark)
    q = (
        "SELECT bit_xor(xxhash64(id, z, w, s, CAST(d AS STRING))) AS fp FROM "
        "randgen_table(500, 'z:zipf:50:1.5, w:element_from_weighted:x|y:3|1, "
        "s:string_alpha:6, d:date_uniform:2020-01-01:2020-12-31', 99)"
    )
    assert spark.sql(q).collect()[0].fp == spark.sql(q).collect()[0].fp


def test_udtf_table_unknown_kind_raises(spark):
    add_udfs(spark)
    with pytest.raises(Exception, match="unknown kind"):
        spark.sql("SELECT * FROM randgen_table(5, 'a:no_such_kind:1')").collect()


def test_word_shingles_short_doc_yields_empty(spark):
    """Documents shorter than k tokens have no k-grams — must be an
    empty array, not an element_at crash (sequence(1,0) is DESCENDING
    in Spark)."""
    from datafusion_randgen_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [("hello world",), ("",), ("one two three four",)], "t string"
    )
    rows = df.select(word_shingles(F.col("t"), 3).alias("g")).collect()
    assert rows[0].g == [] and rows[1].g == []
    assert rows[2].g == ["one two three", "two three four"]


def test_python_datasource_zero_rows(spark):
    df = spark.read.format("randgen").option("rows", 0).option("seed", 1).load()
    assert df.count() == 0


def test_stream_values_independent_of_partitioning(spark):
    """The stream source's values must be a pure function of (seed, id)
    — identical no matter how the offset range is split into batches or
    partitions (the recovery-replay guarantee)."""
    def drain(rows_per_batch, partitions):
        from datafusion_randgen_spark import streaming as st

        stream = (
            spark.readStream.format("randgen")
            .option("rowsperbatch", rows_per_batch)
            .option("maxrows", 3000)
            .option("partitions", partitions)
            .option("seed", 9)
            .option("lo", 5)
            .option("hi", 10)
            .load()
        )
        got = st.run_stream_to_memory(stream, f"st_vals_{rows_per_batch}_{partitions}", spark, mode="append")
        return sorted((r.id, r.x, round(r.u, 12)) for r in got.collect())

    assert drain(500, 2) == drain(1250, 7)


def test_udtf_series_null_step_empty(spark):
    add_udfs(spark)
    rows = spark.sql(
        "SELECT * FROM randgen_series(1, 5, CAST(NULL AS BIGINT))"
    ).collect()
    assert rows == []


def test_udtf_table_null_n_empty(spark):
    add_udfs(spark)
    rows = spark.sql(
        "SELECT * FROM randgen_table(CAST(NULL AS BIGINT), 'a:int64_uniform:1:2', 1)"
    ).collect()
    assert rows == []


def test_arrow_normalize_handles_null_and_empty_rows(spark):
    """NULL embeddings must stay NULL (not become []), empty stay empty,
    and a trailing NULL/empty row must not crash reduceat."""
    from datafusion_randgen_spark.functions.vectors import normalize_embeddings_arrow

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, None), (3, [])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r.embedding for r in normalize_embeddings_arrow(df).collect()}
    assert [round(x, 6) for x in rows[1]] == [0.6, 0.8]
    assert rows[2] is None
    assert rows[3] == []


def test_python_datasource_filter_pushdown_prunes_generation():
    """Volatile reads push id-range filters into the reader: the
    pruned split set covers exactly the surviving range, so out-of-
    range rows are never generated."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
    )

    from datafusion_randgen_spark.sources.python_datasource import RandgenReader

    r = RandgenReader({"rows": "1000000", "partitions": "4"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 100),
                LessThan(("id",), 1100),
                IsNotNull(("id",)),
                EqualTo(("x",), 5),  # non-id: must come back
            ]
        )
    )
    # unsupported filters returned by reference for Spark to re-apply
    assert {type(f).__name__ for f in leftover} == {"IsNotNull", "EqualTo"}
    parts = r.partitions()
    assert parts[0].start == 100 and parts[-1].end == 1100
    assert sum(p.end - p.start for p in parts) == 1000


def test_python_datasource_seeded_declines_pushdown(spark):
    """Seeded values are per-split stream positional, so pruning would
    change them — the reader must hand every filter back and produce
    the SAME values filtered post-scan."""
    from pyspark.sql.datasource import LessThan

    from datafusion_randgen_spark.sources.python_datasource import RandgenReader

    r = RandgenReader({"rows": "1000", "seed": "7"})
    fs = [LessThan(("id",), 10)]
    assert list(r.pushFilters(fs)) == fs
    assert r.partitions()[-1].end == 1000  # range untouched
    # end-to-end: seeded scan + filter equals unfiltered scan head
    full = (
        spark.read.format("randgen")
        .option("rows", 1000).option("seed", 7).option("partitions", 2)
        .load().filter("id < 10").orderBy("id").collect()
    )
    assert [row["id"] for row in full] == list(range(10))


def test_python_datasource_pushdown_empty_range():
    """Contradictory range prunes to a single empty split, not an
    empty split list (Spark would pass read(None))."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from datafusion_randgen_spark.sources.python_datasource import RandgenReader

    r = RandgenReader({"rows": "1000"})
    list(r.pushFilters([GreaterThanOrEqual(("id",), 500), LessThan(("id",), 500)]))
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].start == parts[0].end
