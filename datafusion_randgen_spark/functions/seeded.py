"""Seeded (reproducible) generators — deterministic, JVM-side, shuffle-free.

The volatile parity UDFs (``functions.randgen``) match the reference's
``Volatility::Volatile`` contract; reproducible synthetic data needs the
opposite: a pure function of ``(seed, key)``.  Rather than coordinating
RNG state across executors (fragile: depends on partition layout, batch
splits, task retries), we hash: ``xxhash64(key, seed)`` is a built-in
Catalyst expression, so a seeded generator is

* **deterministic** across runs, partitionings, AND retries (a re-run
  task produces identical values — per-partition RNG streams do not);
* **embarrassingly parallel** — no state, no shuffle, no Python;
* **codegen'd** — stays inside whole-stage codegen at 100 TB.

Bias note: mapping a 64-bit hash into a span via ``pmod`` has modulo
bias ~span/2^64 — immaterial for any practical span.  For doubles we
keep 53 bits: ``hash / 2^64 + 0.5 ∈ [0, 1)``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO_63 = 2.0**63
TWO_64 = 2.0**64


def _h(key: Column, seed: int, salt: int = 0) -> Column:
    """Deterministic int64 hash of (key, seed, salt)."""
    return F.xxhash64(key, F.lit(int(seed)), F.lit(int(salt)))


def seeded_unit_uniform(key: Column, seed: int, salt: int = 0) -> Column:
    """Deterministic double in [0, 1) from (key, seed)."""
    return _h(key, seed, salt).cast("double") / F.lit(TWO_64) + F.lit(0.5)


def seeded_int64_uniform(key: Column, lo, hi, seed: int, salt: int = 0) -> Column:
    """Deterministic uniform int64 in [lo, hi] inclusive, keyed by ``key``."""
    lo_c = lo if isinstance(lo, Column) else F.lit(lo)
    hi_c = hi if isinstance(hi, Column) else F.lit(hi)
    # Decimal(21,0) arithmetic so a full-i64 span (2^64) cannot overflow;
    # cast to long only after adding lo, when the value is back in range.
    span = hi_c.cast("decimal(21,0)") - lo_c.cast("decimal(21,0)") + 1
    draw = (
        F.pmod(_h(key, seed, salt).cast("decimal(21,0)"), span) + lo_c.cast("decimal(21,0)")
    ).cast("long")
    return (
        F.when(lo_c.isNull() | hi_c.isNull(), F.lit(None).cast("long"))
        .when(lo_c > hi_c, F.raise_error(F.lit("seeded_int64_uniform: min > max")).cast("long"))
        .otherwise(draw)
    )


def seeded_float64_uniform(key: Column, lo, hi, seed: int, salt: int = 0) -> Column:
    lo_c = lo if isinstance(lo, Column) else F.lit(lo)
    hi_c = hi if isinstance(hi, Column) else F.lit(hi)
    u = seeded_unit_uniform(key, seed, salt)
    return (
        F.when(lo_c.isNull() | hi_c.isNull(), F.lit(None).cast("double"))
        .otherwise(u * (hi_c.cast("double") - lo_c.cast("double")) + lo_c.cast("double"))
    )


def seeded_float64_normal(key: Column, mean, std, seed: int) -> Column:
    """Deterministic N(mean, std) via Box-Muller over two hash streams."""
    if not isinstance(std, Column) and std is not None and float(std) < 0:
        # same guard as the volatile family — a negative std silently
        # mirrors the distribution instead of erroring
        raise ValueError("seeded_float64_normal: std must be >= 0")
    m_c = mean if isinstance(mean, Column) else F.lit(mean)
    s_c = std if isinstance(std, Column) else F.lit(std)
    # clamp u1 away from 0 so log() is finite
    u1 = F.greatest(seeded_unit_uniform(key, seed, 1), F.lit(1e-300))
    u2 = seeded_unit_uniform(key, seed, 2)
    z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)
    return z * s_c.cast("double") + m_c.cast("double")


def seeded_bool_bernoulli(key: Column, p, seed: int) -> Column:
    if not isinstance(p, Column) and p is not None and not (0.0 <= float(p) <= 1.0):
        # parity with the volatile family: p outside [0, 1] is an error,
        # not a silently-degenerate all-true/all-false column
        raise ValueError("seeded_bool_bernoulli: p must be in [0, 1]")
    p_c = p if isinstance(p, Column) else F.lit(p)
    return F.when(p_c.isNull(), F.lit(None).cast("boolean")).otherwise(
        seeded_unit_uniform(key, seed) < p_c.cast("double")
    )
