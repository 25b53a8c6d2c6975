"""Property-based tests (hypothesis) for the generator family — the
reference's own test strategy (bounds + null matrix as properties, not
golden values; SURVEY.md §5) pushed through randomized inputs.

Each example runs a small Spark job, so example counts are kept low;
the properties are about *semantic* invariants (bounds, determinism,
domain membership), not statistical quality.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs
from pyspark.sql import functions as F

from datafusion_randgen_spark.functions import exprs, seeded

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BOUND = 2**40  # comfortably inside int64 after hi-lo arithmetic


@_settings
@given(
    lo=hs.integers(min_value=-BOUND, max_value=BOUND),
    span=hs.integers(min_value=0, max_value=BOUND),
    seed=hs.integers(min_value=0, max_value=2**31 - 1),
)
def test_seeded_uniform_in_bounds_any_seed(spark, lo, span, seed):
    hi = lo + span
    out = (
        spark.range(0, 200)
        .select(seeded.seeded_int64_uniform(F.col("id"), lo, hi, seed=seed).alias("x"))
        .agg(
            F.count(F.when((F.col("x") < lo) | (F.col("x") > hi), 1)).alias("oob"),
            F.count(F.when(F.col("x").isNull(), 1)).alias("nulls"),
        )
        .collect()[0]
    )
    assert out.oob == 0 and out.nulls == 0


@_settings
@given(seed=hs.integers(min_value=0, max_value=2**31 - 1))
def test_seeded_uniform_partitioning_invariant(spark, seed):
    """Same seed → identical values regardless of partition count —
    THE reproducibility contract for distributed generation."""

    def gen(parts: int) -> list[tuple]:
        return sorted(
            spark.range(0, 100, 1, parts)
            .select("id", seeded.seeded_int64_uniform(F.col("id"), 0, 10**6, seed=seed).alias("x"))
            .collect()
        )

    assert gen(1) == gen(7)


@_settings
@given(
    weights=hs.lists(hs.floats(min_value=0.01, max_value=100.0), min_size=1, max_size=6),
)
def test_weighted_element_domain(spark, weights):
    values = [f"v{i}" for i in range(len(weights))]
    col = exprs.element_from_weighted_expr(values, weights)
    out = (
        spark.range(0, 300)
        .select(col.alias("c"))
        .agg(F.count(F.when(~F.col("c").isin(values), 1)).alias("bad"))
        .collect()[0]
    )
    assert out.bad == 0


@_settings
@given(
    n=hs.integers(min_value=1, max_value=10**6),
    s=hs.floats(min_value=0.1, max_value=3.0).filter(lambda v: abs(v - 1.0) > 1e-6),
)
def test_zipf_rank_in_range(spark, n, s):
    out = (
        spark.range(0, 300)
        .select(exprs.int64_zipf_expr(F.lit(n), F.lit(s)).alias("r"))
        .agg(F.count(F.when((F.col("r") < 1) | (F.col("r") > n), 1)).alias("oob"))
        .collect()[0]
    )
    assert out.oob == 0


def test_zipf_head_is_heaviest(spark):
    """Rank 1 must be the most frequent rank (the defining Zipf shape)."""
    counts = dict(
        spark.range(0, 20_000)
        .select(exprs.int64_zipf_expr(F.lit(100), F.lit(1.5)).alias("r"))
        .groupBy("r")
        .count()
        .collect()
    )
    assert counts[1] == max(counts.values())


_KIND_STRATEGY = hs.sampled_from(
    [
        ("int64_uniform", lambda r: f"{r.randint(-50, 0)}:{r.randint(1, 50)}"),
        ("float64_uniform", lambda r: f"{r.randint(-5, 0)}:{r.randint(1, 5)}"),
        ("float64_normal", lambda r: f"{r.randint(-3, 3)}:{r.randint(1, 4)}"),
        ("bool_bernoulli", lambda r: f"0.{r.randint(1, 9)}"),
        ("zipf", lambda r: f"{r.randint(2, 200)}:1.{r.randint(0, 9)}"),
        ("string_alpha", lambda r: str(r.randint(1, 30))),
        ("element_from", lambda r: "|".join("xyzw"[: r.randint(2, 4)])),
    ]
)


@_settings
@given(
    kinds=hs.lists(_KIND_STRATEGY, min_size=1, max_size=4),
    seed=hs.integers(min_value=0, max_value=2**31 - 1),
    data=hs.randoms(),
)
def test_udtf_random_specs_analyze_and_evaluate(spark, kinds, seed, data):
    """Any well-formed spec must (a) analyze to a schema with one typed
    column per field plus id, (b) evaluate without error, (c) be
    reproducible under the same seed — across randomized kind
    combinations and parameters."""
    from datafusion_randgen_spark import add_udfs

    add_udfs(spark)
    fields = [
        f"c{i}:{kind}:{param_gen(data)}"
        for i, (kind, param_gen) in enumerate(kinds)
    ]
    spec = ", ".join(fields)
    df = spark.sql(f"SELECT * FROM randgen_table(30, '{spec}', {seed})")
    assert len(df.columns) == len(kinds) + 1  # id + one per field
    rows = df.collect()
    assert len(rows) == 30
    again = spark.sql(f"SELECT * FROM randgen_table(30, '{spec}', {seed})").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


@_settings
@given(
    vals=hs.lists(
        hs.integers(min_value=-(2**31), max_value=2**31),
        min_size=1,
        max_size=60,
    ),
    n_buckets=hs.integers(min_value=1, max_value=7),
)
def test_global_cumsum_matches_sequential_prefix_sum(spark, vals, n_buckets):
    """The two-phase distributed prefix sum must equal the sequential
    running total for ANY integer sequence and ANY bucket count
    (boundary ties, negative values, single-element buckets)."""
    from datafusion_randgen_spark.operators import scale

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    got = {
        r["k"]: r["c"]
        for r in scale.global_cumsum(
            df, "k", "v", out_col="c", num_buckets=n_buckets
        ).collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert got == want


@_settings
@given(
    edges=hs.lists(
        hs.tuples(
            hs.sampled_from("abcdef"), hs.sampled_from("abcdef"),
            hs.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ).filter(lambda es: any(a != b for a, b, _ in es)),
)
def test_pagerank_mass_conserved_on_random_graphs(spark, edges):
    """On any self-loop-free weighted graph, total rank mass stays ~1
    after damped iterations as long as every node has outgoing edges;
    to guarantee that, the test symmetrizes the edge set (u<->v), which
    also exercises multi-edge weight merging."""
    from datafusion_randgen_spark.operators import graph

    sym = {}
    for a, b, w in edges:
        if a == b:
            continue
        sym[(a, b)] = sym.get((a, b), 0) + w
        sym[(b, a)] = sym.get((b, a), 0) + w
    e = spark.createDataFrame(
        [(a, b, w) for (a, b), w in sym.items()], "src string, dst string, w long"
    )
    ranks = graph.pagerank(e, iterations=3, round_to=None).collect()
    total = sum(r["rank"] for r in ranks)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r["rank"] > 0 for r in ranks)


# -------------------------------------------------------------------------
# r3 operators: histogram percentiles and fixed-point EWMA
# -------------------------------------------------------------------------

@_settings
@given(
    vals=hs.lists(
        hs.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    ),
    p=hs.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_exact_percentiles_equals_sort_based_any_input(spark, vals, p):
    """Histogram method ≡ percentile() for arbitrary duplicated /
    signed / tiny inputs and any p."""
    from datafusion_randgen_spark.operators import scale

    df = spark.createDataFrame(
        [(1, float(v)) for v in vals], "g int, v double"
    )
    got = scale.exact_percentiles(df, "g", "v", [p]).collect()[0].pct_value
    want = df.agg(F.expr(f"percentile(v, {p!r})").alias("w")).collect()[0].w
    assert got == pytest.approx(want, abs=1e-9)


@_settings
@given(
    xs=hs.lists(
        hs.integers(min_value=0, max_value=10**6), min_size=1, max_size=30
    )
)
def test_ewma_fixed_point_matches_python_reference(spark, xs):
    """The distributed EWMA must equal the sequential recursion, and
    stay inside [min(xs), max(xs)] (a convex combination, up to the
    floor-division bias which can only pull toward zero by < 1)."""
    from datafusion_randgen_spark.operators import timeseries

    ser = spark.createDataFrame(
        [(1, t + 1, x) for t, x in enumerate(xs)], "user_id long, t int, x long"
    )
    got = [
        r.ew
        for r in timeseries.ewma_fixed_point(ser).orderBy("t").collect()
    ]
    want, prev = [], None
    for x in xs:
        prev = x if prev is None else (7 * prev + 3 * x) // 10
        want.append(prev)
    assert got == want
    assert all(min(xs) - 1 <= e <= max(xs) for e in got)
