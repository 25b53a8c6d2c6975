"""1:1 ports of the reference's 9 end-to-end SQL tests, plus the checks
the reference misses (SURVEY.md §5).

Reference tests live at ``/root/reference/src/randgen/int64_uniform.rs``:
bound-property tests ``:166-220`` (one per dispatch arm) and the 5-case
null-propagation matrix ``:222-275``.  DataFusion's
``generate_series(1, 100)`` is inclusive → ``range(1, 101)`` in Spark.
"""

from __future__ import annotations

import pytest


def vals(spark, sql):
    """query_to_values equivalent (test_helpers.rs:7-33): run SQL, flatten col 0."""
    df = spark.sql(sql)
    return [r[0] for r in df.collect()], df.schema[0].dataType.typeName()


# --- bound-property tests, one per reference dispatch arm ---------------

def test_const_const_bounds(spark):
    # int64_uniform.rs:166-178
    xs, t = vals(spark, "SELECT randgen_int64_uniform(1, 10) AS x FROM range(1, 101)")
    assert t == "long" and len(xs) == 100
    assert all(1 <= x <= 10 for x in xs)
    # the reference's const×const arm broadcasts ONE draw per batch
    # (int64_uniform.rs:68-75); we deliberately draw per row (SURVEY §4).
    assert len(set(xs)) > 1


def test_array_const_bounds(spark):
    # int64_uniform.rs:180-192: inner y in [1,10], outer uniform(y, 20) in [1,20]
    xs, _ = vals(
        spark,
        "SELECT randgen_int64_uniform(y, 20) AS x FROM "
        "(SELECT randgen_int64_uniform(1, 10) AS y FROM range(1, 101))",
    )
    assert len(xs) == 100 and all(1 <= x <= 20 for x in xs)


def test_const_array_bounds(spark):
    # int64_uniform.rs:194-206
    xs, _ = vals(
        spark,
        "SELECT randgen_int64_uniform(1, y) AS x FROM "
        "(SELECT randgen_int64_uniform(11, 20) AS y FROM range(1, 101))",
    )
    assert len(xs) == 100 and all(1 <= x <= 20 for x in xs)


def test_array_array_bounds(spark):
    # int64_uniform.rs:208-220
    xs, _ = vals(
        spark,
        "SELECT randgen_int64_uniform(lo, hi) AS x FROM "
        "(SELECT randgen_int64_uniform(1, 10) AS lo, randgen_int64_uniform(11, 20) AS hi "
        " FROM range(1, 101))",
    )
    assert len(xs) == 100 and all(1 <= x <= 20 for x in xs)


def test_per_row_bounds_with_columns(spark):
    """Stronger than the reference (it only checks the union range)."""
    rows = spark.sql(
        "SELECT lo, hi, randgen_int64_uniform(lo, hi) AS x FROM "
        "(SELECT 1 + id % 10 AS lo, 11 + id % 10 AS hi FROM range(1, 101))"
    ).collect()
    assert all(r.lo <= r.x <= r.hi for r in rows)


# --- null-propagation matrix (int64_uniform.rs:222-275) -----------------

@pytest.mark.parametrize(
    "expr",
    [
        "randgen_int64_uniform(1, CAST(NULL AS BIGINT))",                      # :222-231
        "randgen_int64_uniform(randgen_int64_uniform(1, 10), CAST(NULL AS BIGINT))",  # :233-242
        "randgen_int64_uniform(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))",   # :244-253
        "randgen_int64_uniform(CAST(NULL AS BIGINT), 10)",                     # :255-264
        "randgen_int64_uniform(CAST(NULL AS BIGINT), randgen_int64_uniform(11, 20))",  # :266-275
    ],
)
def test_null_propagation_all_null(spark, expr):
    xs, t = vals(spark, f"SELECT {expr} AS x FROM range(1, 101)")
    assert t == "long" and len(xs) == 100 and all(x is None for x in xs)


def test_mixed_null_array_slots(spark):
    """Nulls *inside* bound columns — untested in the reference (SURVEY §5)."""
    rows = spark.sql(
        "SELECT lo, hi, randgen_int64_uniform(lo, hi) AS x FROM "
        "(SELECT IF(id % 3 = 0, NULL, 1 + id % 10) AS lo, "
        "        IF(id % 4 = 0, NULL, 11 + id % 10) AS hi FROM range(1, 101))"
    ).collect()
    for r in rows:
        if r.lo is None or r.hi is None:
            assert r.x is None
        else:
            assert r.lo <= r.x <= r.hi


# --- semantics the reference's tests miss (SURVEY.md §5) ----------------

def test_inclusive_endpoints_reached(spark):
    xs, _ = vals(spark, "SELECT randgen_int64_uniform(1, 2) AS x FROM range(1, 2001)")
    assert set(xs) == {1, 2}


def test_degenerate_range(spark):
    xs, _ = vals(spark, "SELECT randgen_int64_uniform(7, 7) AS x FROM range(1, 101)")
    assert set(xs) == {7}


def test_extreme_range_no_overflow(spark):
    xs, _ = vals(
        spark,
        "SELECT randgen_int64_uniform(-9223372036854775808, 9223372036854775807) AS x "
        "FROM range(1, 1001)",
    )
    assert len(set(xs)) > 990  # collisions over the full i64 space ~impossible


def test_min_gt_max_raises(spark):
    # reference panics (Uniform::new_inclusive(..).unwrap(), :99)
    with pytest.raises(Exception, match="invalid range"):
        spark.sql("SELECT randgen_int64_uniform(100, 1) AS x FROM range(1, 11)").collect()


def test_nondeterministic_flag(spark):
    """Forgetting .asNondeterministic() silently breaks semantics (SURVEY §4)."""
    from datafusion_randgen_spark.functions import randgen as rg

    for name, udf in rg._PARITY_UDFS.items():
        assert not udf.deterministic, name


def test_statistical_mean(spark):
    # note: Spark 4 rejects nondeterministic exprs directly inside an
    # aggregate argument — generate in a subquery, aggregate outside.
    row = spark.sql(
        "SELECT avg(x) AS m FROM "
        "(SELECT randgen_int64_uniform(1, 100) AS x FROM range(1, 100001))"
    ).collect()[0]
    assert abs(row.m - 50.5) < 1.0  # se ≈ 0.09, 10σ margin


def test_nullable_extreme_bounds_exact(spark):
    """A NULLABLE bound column at i64::MAX must not round-trip through
    float64 (2^53 precision cliff): the Int64Dtype kernel branch keeps
    the full i64 range exact even when the batch contains nulls."""
    rows = spark.sql(
        """
        SELECT randgen_int64_uniform(9223372036854775806, hi) AS x
        FROM VALUES (CAST(9223372036854775807 AS BIGINT)),
                    (CAST(NULL AS BIGINT)) t(hi)
        """
    ).collect()
    assert rows[0].x in (9223372036854775806, 9223372036854775807)
    assert rows[1].x is None
