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


def date_uniform_expr(lo: ColumnOrName, hi: ColumnOrName) -> Column:
    """Uniform date in [lo, hi] inclusive."""
    lo_c, hi_c = _c(lo), _c(hi)
    lo_d, hi_d = lo_c.cast("date"), hi_c.cast("date")
    return F.date_add(lo_d, int64_uniform_expr(F.lit(0), F.datediff(hi_d, lo_d)).cast("int"))


def float64_exponential_expr(rate: ColumnOrName) -> Column:
    """Exponential(rate) via inverse CDF: -ln(1 - u) / rate; mean 1/rate."""
    r_c = _c(rate)
    draw = -F.log(F.lit(1.0) - F.rand()) / r_c.cast("double")
    return (
        F.when(r_c.isNull(), F.lit(None).cast("double"))
        .when(r_c <= 0, F.raise_error(F.lit("float64_exponential_expr: rate <= 0")).cast("double"))
        .otherwise(draw)
    )


def float64_lognormal_expr(mu: ColumnOrName, sigma: ColumnOrName) -> Column:
    """LogNormal(mu, sigma): exp(N(mu, sigma)); median = e^mu."""
    return F.exp(float64_normal_expr(mu, sigma))


def int64_zipf_expr(n: ColumnOrName, s: ColumnOrName) -> Column:
    """Approximate Zipf(s) rank in [1, n] via the continuous inverse CDF
    ``floor(((n^(1-s) - 1)·u + 1)^(1/(1-s)))``, clamped to [1, n]; at
    the removable singularity s = 1 the formula's limit ``n^u`` is used
    (matching the seeded generator, so a spec that validates in one
    seed mode cannot break in the other).

    This is the standard generator for *skewed synthetic join keys* —
    the tool you reach for when testing salting / AQE skew handling at
    scale.  The rank-frequency curve tracks an exact Zipf to within a
    few percent; the heavy head (rank 1 most frequent) is exact.
    """
    n_c, s_c = _c(n), _c(s)
    u = F.rand()
    one_minus_s = F.lit(1.0) - s_c.cast("double")
    x = F.when(s_c.cast("double") == 1.0, F.pow(n_c.cast("double"), u)).otherwise(
        F.pow(
            (F.pow(n_c.cast("double"), one_minus_s) - F.lit(1.0)) * u + F.lit(1.0),
            F.lit(1.0) / one_minus_s,
        )
    )
    draw = F.least(F.greatest(F.floor(x).cast("long"), F.lit(1)), n_c.cast("long"))
    return (
        F.when(n_c.isNull() | s_c.isNull(), F.lit(None).cast("long"))
        .when((n_c < 1) | (s_c <= 0),
              F.raise_error(F.lit("int64_zipf_expr: need n >= 1, s > 0")).cast("long"))
        .otherwise(draw)
    )


def element_from_weighted_expr(values: list, weights: list[float]) -> Column:
    """Weighted categorical draw from Python-side (values, weights).

    Compiles to a codegen'd CASE over cumulative probabilities — no HOF,
    no UDF; the per-row cost is a handful of double compares.  This is
    the deliberate design for synthetic-data category columns (country,
    event_type, label): the domain is plan-time metadata, not data.
    """
    if len(values) != len(weights) or not values:
        raise ValueError("element_from_weighted_expr: values/weights must be same nonzero length")
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError("element_from_weighted_expr: weights must be >= 0 with positive sum")
    total = float(sum(weights))
    # Index = Σ 1[u >= cum_i], all terms evaluated UNCONDITIONALLY over
    # copies of ONE same-seeded Rand.  A CASE WHEN chain would be wrong
    # here: branch conditions evaluate conditionally, so the per-branch
    # Rand copies desynchronize (branch 2 only advances on rows where
    # branch 1 failed) and branches compare DIFFERENT uniforms.  An
    # unconditional sum advances every copy once per row in lockstep,
    # so all comparisons see the same draw.  (Distinct F.rand() calls
    # would be wrong differently: independent seeds → independent
    # indicators → not a categorical distribution.)
    cums: list[float] = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w / total
        cums.append(acc)
    if not cums:
        return F.lit(values[0])
    u = F.rand()  # one seed, copied into every indicator below
    idx = sum(((u >= F.lit(c)).cast("int") for c in cums), F.lit(0))
    return F.element_at(F.array(*[F.lit(v) for v in values]), idx + 1)


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
