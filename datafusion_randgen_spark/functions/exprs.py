"""Expression fast paths — pure-Catalyst randgen builders.

Same distributions as ``functions.randgen`` but built from
``pyspark.sql.functions`` primitives (``rand``/``randn``), so they stay
JVM-side inside whole-stage codegen: no Arrow transfer, no Python worker.
This is the 100 TB path — per-row cost is a few codegen'd arithmetic ops.

Trade-offs vs the parity pandas UDFs (documented, deliberate):

* ``rand()`` has 53 bits of mantissa, so ``int64_uniform_expr`` over a
  span wider than 2^53 quantizes (the pandas UDF draws exact 64-bit
  integers).  For every realistic generation span this is irrelevant.
* ``min > max`` yields a runtime error via ``raise_error`` (ANSI-style),
  matching the reference's panic semantics
  (``/root/reference/src/randgen/int64_uniform.rs:99``).
* NULL propagation is native: arithmetic over NULL is NULL.

Each builder also registers as a SQL UDF (``CREATE TEMPORARY FUNCTION …
RETURNS … RETURN <expr>``) so the fast path is reachable from plain SQL;
SQL UDF bodies are inlined into the plan by the analyzer, so they codegen
exactly like the Column builders.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

ColumnOrName = Column | str | int | float


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def int64_uniform_expr(lo: ColumnOrName, hi: ColumnOrName) -> Column:
    """Uniform int64 in [lo, hi] inclusive, JVM-side.

    ``floor(rand() * (span)) + lo`` with span = hi - lo + 1; NULL in
    either bound propagates; lo > hi raises at runtime.
    """
    lo_c, hi_c = _c(lo), _c(hi)
    span = hi_c.cast("double") - lo_c.cast("double") + F.lit(1.0)
    draw = F.floor(F.rand() * span).cast("long") + lo_c.cast("long")
    return (
        F.when(lo_c.isNull() | hi_c.isNull(), F.lit(None).cast("long"))
        .when(lo_c > hi_c, F.raise_error(F.lit("int64_uniform_expr: min > max")).cast("long"))
        .otherwise(draw)
    )


def float64_uniform_expr(lo: ColumnOrName, hi: ColumnOrName) -> Column:
    lo_c, hi_c = _c(lo), _c(hi)
    draw = F.rand() * (hi_c.cast("double") - lo_c.cast("double")) + lo_c.cast("double")
    return (
        F.when(lo_c.isNull() | hi_c.isNull(), F.lit(None).cast("double"))
        .when(lo_c > hi_c, F.raise_error(F.lit("float64_uniform_expr: min > max")).cast("double"))
        .otherwise(draw)
    )


def float64_normal_expr(mean: ColumnOrName, std: ColumnOrName) -> Column:
    m_c, s_c = _c(mean), _c(std)
    return (
        F.when(m_c.isNull() | s_c.isNull(), F.lit(None).cast("double"))
        .when(s_c < 0, F.raise_error(F.lit("float64_normal_expr: std < 0")).cast("double"))
        .otherwise(F.randn() * s_c.cast("double") + m_c.cast("double"))
    )


def bool_bernoulli_expr(p: ColumnOrName) -> Column:
    p_c = _c(p)
    return (
        F.when(p_c.isNull(), F.lit(None).cast("boolean"))
        .when((p_c < 0) | (p_c > 1), F.raise_error(F.lit("bool_bernoulli_expr: p outside [0,1]")).cast("boolean"))
        .otherwise(F.rand() < p_c.cast("double"))
    )


def element_from_expr(arr: Column) -> Column:
    """Uniformly pick one element of an array column (NULL/empty -> NULL)."""
    idx = (F.floor(F.rand() * F.size(arr)) + F.lit(1)).cast("int")
    return F.when(arr.isNull() | (F.size(arr) == 0), F.lit(None)).otherwise(
        F.element_at(arr, idx)
    )


def timestamp_uniform_expr(lo: ColumnOrName, hi: ColumnOrName) -> Column:
    """Uniform timestamp in [lo, hi] (microsecond granularity)."""
    lo_c, hi_c = _c(lo), _c(hi)
    lo_us = F.unix_micros(lo_c.cast("timestamp"))
    hi_us = F.unix_micros(hi_c.cast("timestamp"))
    return F.timestamp_micros(int64_uniform_expr(lo_us, hi_us))


_SQL_FASTPATHS = {
    "randgen_int64_uniform_expr": (
        "(lo BIGINT, hi BIGINT) RETURNS BIGINT RETURN "
        "CASE WHEN lo IS NULL OR hi IS NULL THEN CAST(NULL AS BIGINT) "
        "WHEN lo > hi THEN CAST(raise_error('randgen_int64_uniform_expr: min > max') AS BIGINT) "
        "ELSE CAST(floor(rand() * (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE) + 1.0d)) AS BIGINT) + lo END"
    ),
    "randgen_float64_uniform_expr": (
        "(lo DOUBLE, hi DOUBLE) RETURNS DOUBLE RETURN "
        "CASE WHEN lo IS NULL OR hi IS NULL THEN CAST(NULL AS DOUBLE) "
        "WHEN lo > hi THEN CAST(raise_error('randgen_float64_uniform_expr: min > max') AS DOUBLE) "
        "ELSE rand() * (hi - lo) + lo END"
    ),
    "randgen_float64_normal_expr": (
        "(mean DOUBLE, std DOUBLE) RETURNS DOUBLE RETURN "
        "CASE WHEN mean IS NULL OR std IS NULL THEN CAST(NULL AS DOUBLE) "
        "WHEN std < 0 THEN CAST(raise_error('randgen_float64_normal_expr: std < 0') AS DOUBLE) "
        "ELSE randn() * std + mean END"
    ),
    "randgen_bool_bernoulli_expr": (
        "(p DOUBLE) RETURNS BOOLEAN RETURN "
        "CASE WHEN p IS NULL THEN CAST(NULL AS BOOLEAN) "
        "WHEN p < 0 OR p > 1 THEN CAST(raise_error('randgen_bool_bernoulli_expr: p outside [0,1]') AS BOOLEAN) "
        "ELSE rand() < p END"
    ),
}


def register_sql_fastpaths(spark: SparkSession) -> None:
    """Register the expression fast paths as SQL UDFs (inlined by Catalyst)."""
    for name, body in _SQL_FASTPATHS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
