"""Declarative synthetic-table generation — the engine's headline
source.

The reference generates random columns one SQL call at a time
(``SELECT randgen_int64_uniform(1,10) FROM generate_series(1,100)``,
``/root/reference/src/randgen/int64_uniform.rs:170``).  At 100 TB you
generate whole *tables* from a schema spec::

    spec = {
        "user_id":  {"kind": "int64_uniform", "lo": 1, "hi": 10_000_000},
        "score":    {"kind": "float64_normal", "mean": 0.0, "std": 1.0},
        "joined":   {"kind": "timestamp_uniform",
                     "lo": "2024-01-01", "hi": "2024-12-31"},
        "country":  {"kind": "element_from_weighted",
                     "values": ["US", "DE", "IN"], "weights": [5, 2, 3]},
        "hot_key":  {"kind": "zipf", "n": 1000, "s": 1.2},
    }
    df = synthetic_table(spark, 1_000_000, spec, seed=42)

Scale design:

* The row source is ``spark.range(n, numPartitions=p)`` — generation is
  embarrassingly parallel, there is **no shuffle anywhere** in a
  generated plan; ``num_partitions`` is the only scale knob (2-3× total
  cores at cluster scale).
* ``seed=None`` → volatile columns built from the pure-Catalyst
  ``functions.exprs`` builders (``rand``/``randn``): whole-stage
  codegen, no Python workers.
* ``seed=k`` → **reproducible** columns from ``functions.seeded`` hash
  generators keyed on the row id: identical output for any partition
  count AND under task retries (per-partition RNG streams guarantee
  neither).  Each column gets a distinct salt so columns are
  independent.
* ``write_synthetic`` sinks through ``df.write.parquet`` with optional
  ``partition_by`` — generation → columnar files without ever
  materializing on the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_randgen_spark.functions import exprs, seeded

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"
#: base-26 digit symbols as Spark's ``conv`` emits them (digits then
#: UPPERCASE letters) — translate()d onto the alphabet
_BASE26_DIGITS = "0123456789ABCDEFGHIJKLMNOP"


def _alpha_block(draw: Column, block: int) -> Column:
    """``block`` lowercase chars from one long ``draw`` ∈ [0, 26^block):
    base-26 expansion via ``conv`` + ``translate`` — 3 codegen'd exprs
    per block instead of per-character hash machinery."""
    return F.translate(
        F.lpad(F.conv(draw.cast("string"), 10, 26), block, "0"),
        _BASE26_DIGITS,
        _ALPHABET,
    )


def _seeded_alpha_string(key: Column, length: int, seed: int, salt: int) -> Column:
    """Deterministic lowercase string, 12 chars per 64-bit hash draw
    (26^12 ≈ 2^56 < 2^63, so one ``pmod`` keeps the draw exact and
    near-uniform; modulo bias ≈ 26^12/2^64 ≈ 0.2% — immaterial for
    synthetic text).  Plan size is O(length/12), so spec strings of
    length 256+ no longer blow up the expression tree (the previous
    one-hash-per-char form did)."""
    BLOCK = 12
    mod = 26**BLOCK
    # (salt, i) hashed as SEPARATE arguments: an arithmetic namespace
    # like salt*1000+i collides across columns once i crosses the
    # stride (block 1000+j of column s == block j of column s+1),
    # silently correlating "independent" string columns
    blocks = [
        _alpha_block(
            F.pmod(F.xxhash64(key, F.lit(seed), F.lit(salt), F.lit(i)), F.lit(mod)),
            BLOCK,
        )
        for i in range((length + BLOCK - 1) // BLOCK)
    ]
    if not blocks:
        return F.lit("")
    return F.substring(F.concat(*blocks), 1, length)


def _seeded_zipf(key: Column, n: int, s: float, seed: int, salt: int) -> Column:
    u = seeded.seeded_unit_uniform(key, seed, salt)
    if s == 1.0:
        # removable singularity of the inverse CDF: lim s->1 is n^u
        x = F.pow(F.lit(float(n)), u)
    else:
        one_minus_s = 1.0 - s
        x = F.pow(
            (F.lit(math.pow(n, one_minus_s) - 1.0)) * u + F.lit(1.0),
            F.lit(1.0 / one_minus_s),
        )
    return F.least(F.greatest(F.floor(x).cast("long"), F.lit(1)), F.lit(int(n)))


def _seeded_weighted(key: Column, values: list, weights: list[float], seed: int, salt: int) -> Column:
    # same guards as the volatile twin (exprs.element_from_weighted_expr)
    # — zip() would silently truncate a length mismatch into a wrong
    # distribution, and a zero-sum divides by zero at plan time
    if len(values) != len(weights) or not values:
        raise ValueError("element_from_weighted: values/weights must be same nonzero length")
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError("element_from_weighted: weights must be >= 0 with positive sum")
    total = float(sum(weights))
    u = seeded.seeded_unit_uniform(key, seed, salt)
    cum = 0.0
    expr = None
    for v, w in zip(values[:-1], weights[:-1]):
        cum += w / total
        expr = (expr.when if expr is not None else F.when)(u < F.lit(cum), F.lit(v))
    return expr.otherwise(F.lit(values[-1])) if expr is not None else F.lit(values[0])


def _column(kind_spec: dict, key: Column, seed: int | None, salt: int) -> Column:
    kind = kind_spec["kind"]
    sp = kind_spec
    if seed is None:
        if kind == "int64_uniform":
            return exprs.int64_uniform_expr(sp["lo"], sp["hi"])
        if kind == "float64_uniform":
            return exprs.float64_uniform_expr(sp["lo"], sp["hi"])
        if kind == "float64_normal":
            return exprs.float64_normal_expr(sp["mean"], sp["std"])
        if kind == "float64_exponential":
            return exprs.float64_exponential_expr(sp["rate"])
        if kind == "float64_lognormal":
            return exprs.float64_lognormal_expr(sp["mu"], sp["sigma"])
        if kind == "bool_bernoulli":
            return exprs.bool_bernoulli_expr(sp["p"])
        if kind == "timestamp_uniform":
            return exprs.timestamp_uniform_expr(F.lit(sp["lo"]), F.lit(sp["hi"]))
        if kind == "date_uniform":
            return exprs.date_uniform_expr(F.lit(sp["lo"]), F.lit(sp["hi"]))
        if kind == "zipf":
            return exprs.int64_zipf_expr(sp["n"], sp["s"])
        if kind == "element_from":
            return exprs.element_from_expr(F.array(*[F.lit(v) for v in sp["values"]]))
        if kind == "element_from_weighted":
            return exprs.element_from_weighted_expr(sp["values"], sp["weights"])
        if kind == "string_alpha":
            # volatile strings: 11 chars per rand() draw (26^11 ≈ 2^51.8
            # stays inside the double's 53-bit exact-integer range), same
            # O(length/block) plan size as the seeded path
            length = int(sp["length"])
            BLOCK = 11
            blocks = [
                _alpha_block(F.floor(F.rand() * F.lit(float(26**BLOCK))).cast("long"), BLOCK)
                for _ in range((length + BLOCK - 1) // BLOCK)
            ]
            if not blocks:
                return F.lit("")
            return F.substring(F.concat(*blocks), 1, length)
    else:
        if kind == "int64_uniform":
            return seeded.seeded_int64_uniform(key, sp["lo"], sp["hi"], seed, salt)
        if kind == "float64_uniform":
            return seeded.seeded_float64_uniform(key, sp["lo"], sp["hi"], seed, salt)
        if kind == "float64_normal":
            return seeded.seeded_float64_normal(key, sp["mean"], sp["std"], seed + salt)
        if kind == "float64_exponential":
            if float(sp["rate"]) <= 0:
                raise ValueError("float64_exponential: rate must be > 0")
            u = seeded.seeded_unit_uniform(key, seed, salt)
            return -F.log(F.lit(1.0) - F.greatest(F.least(u, F.lit(1.0 - 1e-16)), F.lit(0.0))) / F.lit(
                float(sp["rate"])
            )
        if kind == "float64_lognormal":
            return F.exp(seeded.seeded_float64_normal(key, sp["mu"], sp["sigma"], seed + salt))
        if kind == "bool_bernoulli":
            return seeded.seeded_bool_bernoulli(key, sp["p"], seed + salt)
        if kind == "timestamp_uniform":
            lo_us = F.unix_micros(F.lit(sp["lo"]).cast("timestamp"))
            hi_us = F.unix_micros(F.lit(sp["hi"]).cast("timestamp"))
            return F.timestamp_micros(seeded.seeded_int64_uniform(key, lo_us, hi_us, seed, salt))
        if kind == "date_uniform":
            lo_d = F.lit(sp["lo"]).cast("date")
            hi_d = F.lit(sp["hi"]).cast("date")
            off = seeded.seeded_int64_uniform(key, 0, F.datediff(hi_d, lo_d), seed, salt)
            return F.date_add(lo_d, off.cast("int"))
        if kind == "zipf":
            return _seeded_zipf(key, sp["n"], sp["s"], seed, salt)
        if kind == "element_from":
            n = len(sp["values"])
            idx = seeded.seeded_int64_uniform(key, 0, n - 1, seed, salt)
            return F.element_at(F.array(*[F.lit(v) for v in sp["values"]]), (idx + 1).cast("int"))
        if kind == "element_from_weighted":
            return _seeded_weighted(key, sp["values"], sp["weights"], seed, salt)
        if kind == "string_alpha":
            return _seeded_alpha_string(key, int(sp["length"]), seed, salt)
    raise ValueError(f"synthetic_table: unknown column kind {kind!r}")


def synthetic_table(
    spark: SparkSession,
    n_rows: int,
    spec: dict[str, dict],
    seed: int | None = None,
    num_partitions: int | None = None,
    id_col: str | None = "id",
) -> DataFrame:
    """Generate ``n_rows`` rows with one column per ``spec`` entry.

    ``seed=None`` → volatile (fresh data every run); ``seed=k`` →
    bit-for-bit reproducible regardless of partitioning/retries.
    ``id_col`` keeps the monotone row id (None drops it).
    """
    p = num_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, p)
    cols = [F.col("id").alias(id_col)] if id_col else []
    for salt, (name, kind_spec) in enumerate(spec.items(), start=1):
        cols.append(_column(kind_spec, F.col("id"), seed, salt).alias(name))
    return base.select(*cols)


def write_synthetic(
    spark: SparkSession,
    path: str,
    n_rows: int,
    spec: dict[str, dict],
    seed: int | None = None,
    num_partitions: int | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Generate and sink to parquet — the distributed write path (no
    driver materialization; output file count == ``num_partitions`` per
    partition_by value)."""
    df = synthetic_table(spark, n_rows, spec, seed, num_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
