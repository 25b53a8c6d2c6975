"""Opt-in scale smoke: the dedup pipeline at ~40× the sf0.1 fixture.

Gated behind SPARK_GRAFT_SCALE_TESTS=1 so the per-round suite stays
fast; run manually when touching the dedup/LSH hot paths:

    SPARK_GRAFT_SCALE_TESTS=1 python -m pytest tests/test_scale_smoke.py -q

The corpus is generated (seeded synthetic docs with planted duplicate
pairs), so the expected pair count is known exactly — this is the
"would it still work at 1000× " probe: candidate volume must stay
~linear, no stage may collect the corpus, and the planted dups must
all surface.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_randgen_spark.operators import dedup

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TESTS") != "1",
    reason="scale smoke is opt-in (SPARK_GRAFT_SCALE_TESTS=1)",
)

N_DOCS = 200_000
N_DUP_PAIRS = 1_000


@pytest.fixture(scope="module")
def big_docs(spark):
    """200k synthetic docs; doc_id < N_DUP_PAIRS gets an exact twin at
    doc_id + N_DOCS (same text) — the planted truth set."""
    from datafusion_randgen_spark.sources.synthetic import synthetic_table

    base = synthetic_table(
        spark,
        N_DOCS,
        {"w1": {"kind": "string_alpha", "length": 40}},
        seed=11,
        num_partitions=16,
    ).select(
        F.col("id").alias("doc_id"),
        # ~8 pseudo-words so shingling (k=3) has real n-grams
        F.concat_ws(
            " ",
            *[F.substring("w1", i * 5 + 1, 5) for i in range(8)],
        ).alias("text"),
    )
    twins = base.filter(F.col("doc_id") < N_DUP_PAIRS).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"), "text"
    )
    return base.unionByName(twins).localCheckpoint(eager=True)


def test_exact_dedup_finds_planted_twins_at_scale(big_docs):
    groups = dedup.exact_dedup(big_docs)
    dup_groups = groups.filter(F.col("group_size") > 1)
    # every planted twin collides; seeded 40-char alphabet strings make
    # accidental collisions effectively impossible
    assert dup_groups.count() == N_DUP_PAIRS
    assert big_docs.count() == N_DOCS + N_DUP_PAIRS


def test_minhash_lsh_finds_planted_twins_at_scale(big_docs):
    pairs = dedup.minhash_lsh_dedup_pairs(big_docs, threshold=0.9)
    found = {
        (r.id_a, r.id_b)
        for r in pairs.filter(F.col("jaccard") >= 0.999).collect()
    }
    planted = {(i, i + N_DOCS) for i in range(N_DUP_PAIRS)}
    # identical texts share every shingle -> every band collides -> LSH
    # recall on exact twins is 1.0 by construction
    assert planted <= found


def test_contamination_check_at_scale(big_docs):
    """5-gram decontamination at ~200k docs: every planted twin of a
    'benchmark' doc must register as contaminated (its text exists
    verbatim in the train split), and the join stays hash-only."""
    from datafusion_randgen_spark import plans
    from datafusion_randgen_spark.functions import text as tx
    from datafusion_randgen_spark.queries import _word_grams

    grams = big_docs.select(
        "doc_id",
        F.explode(_word_grams(tx.tokens(F.col("text")), 5)).alias("g"),
    )
    bench_ids = F.col("doc_id") >= N_DOCS  # the planted twins
    train = grams.filter(~bench_ids).select("g").distinct()
    bench = grams.filter(bench_ids).distinct()
    overlap = bench.join(train, "g").groupBy("doc_id").agg(
        F.count("*").alias("n_hit")
    )
    plan = plans.physical_plan(overlap)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # EVERY distinct gram of every twin must hit train (its source doc
    # is there verbatim): per-doc overlap count == per-doc distinct
    # gram count, not merely >= 1
    per_doc = bench.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    full = per_doc.join(overlap, "doc_id", "left")
    assert full.count() == N_DUP_PAIRS
    assert full.filter(
        F.col("n_hit").isNull() | (F.col("n_hit") != F.col("n_grams"))
    ).count() == 0


def test_kmeans_combiner_pattern_at_scale(spark):
    """k-means over 200k synthetic 32-dim vectors: per-iteration driver
    traffic is k x dim partials, raw vectors never shuffle, inertia
    stays monotone."""
    from datafusion_randgen_spark.functions.vectors import synthetic_embeddings
    from datafusion_randgen_spark.operators import clustering

    emb = synthetic_embeddings(
        spark, n=200_000, dim=32, n_clusters=8, seed=5, num_partitions=16
    ).localCheckpoint(eager=True)
    _, inertias, assignments = clustering.kmeans(
        emb, k=8, iterations=3, id_col="vec_id", vec_col="embedding"
    )
    assert assignments.count() == 200_000
    assert all(b <= a * (1 + 1e-9) for a, b in zip(inertias, inertias[1:]))


def test_exact_percentiles_at_scale(spark):
    """5M rows, 3 groups, 100 distinct values: the histogram method
    must return the same medians percentile() would, while shuffling
    only the ~300-row histogram past the first aggregate."""
    from datafusion_randgen_spark.operators import scale

    df = spark.range(0, 5_000_000, 1, 32).select(
        (F.col("id") % 3).alias("g"),
        ((F.col("id") * 7919) % 100).cast("double").alias("v"),
    )
    got = {
        (r.g, r.p): r.pct_value
        for r in scale.exact_percentiles(df, "g", "v", [0.25, 0.5, 0.75]).collect()
    }
    want_rows = df.groupBy("g").agg(
        F.expr("percentile(v, array(0.25, 0.5, 0.75))").alias("ps")
    ).collect()
    want = {
        (r.g, p): r.ps[i]
        for r in want_rows
        for i, p in enumerate([0.25, 0.5, 0.75])
    }
    assert got == pytest.approx(want)


def test_ewma_fixed_point_at_scale(spark):
    """5M rows across 32 series (~156k elements each): the ufunc
    accumulate path must agree with the closed recursion spot-checked
    in Python on one series, and the per-series Arrow batches must
    come back complete."""
    from datafusion_randgen_spark.operators import timeseries

    n, series = 5_000_000, 32
    df = spark.range(0, n, 1, 32).select(
        (F.col("id") % series).alias("user_id"),
        (F.col("id") / series + 1).cast("int").alias("t"),
        ((F.col("id") * 7919) % 1000).alias("x"),
    )
    out = timeseries.ewma_fixed_point(df, num=7, den=10)
    assert out.count() == n
    got = [
        r.ew
        for r in out.filter(F.col("user_id") == 3)
        .orderBy("t")
        .limit(200)
        .collect()
    ]
    xs = [((i * 32 + 3) * 7919) % 1000 for i in range(200)]
    prev = None
    for i, x in enumerate(xs):
        prev = x if prev is None else (7 * prev + 3 * x) // 10
        assert got[i] == prev


def test_bfs_distances_at_scale(spark):
    """1M-node ring+doubling graph: BFS from 0 must terminate in
    ~log2(n) frontier rounds (≤ 45 hops covers n=1M via doubling),
    with per-round state bounded by the frontier."""
    from datafusion_randgen_spark.operators import graph

    n = 1_000_000
    base = spark.range(n)
    edges = base.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    ).union(base.select(F.col("id"), (F.col("id") * 2) % n))
    out = graph.bfs_distances(edges, 0, max_hops=45)
    assert out.count() == n  # every node reachable within the cap


def test_skew_routed_dedup_at_scale(spark):
    """~200k rows with ONE digest carrying 25% of the corpus: the
    routed rep join must label every row correctly while the hot rows
    take the broadcast path (never a corpus-keyed shuffle reducer) —
    the r9 hot-key behavior sf0.1 plan pins can't load-test."""
    from datafusion_randgen_spark import plans

    n = 200_000
    docs = spark.range(n).repartition(16).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, F.lit("hot boilerplate page"))
        .otherwise(F.concat(F.lit("unique doc "), F.col("id").cast("string")))
        .alias("text"),
    )
    labeled = dedup.skew_routed_dedup_labels(docs, heavy_min_count=1000)
    plan = plans.physical_plan(labeled)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    agg = labeled.agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_heavy_key").cast("long")).alias("hot"),
        F.count_distinct("dedup_key").alias("groups"),
        F.max("group_size").alias("max_gs"),
    ).collect()[0]
    assert agg.n == n
    assert agg.hot == n // 4
    assert agg.groups == n - n // 4 + 1
    assert agg.max_gs == n // 4
    # every hot row labeled with the global min-id keeper (0)
    assert (
        labeled.filter(F.col("is_heavy_key") & (F.col("keeper") != 0)).count()
        == 0
    )


def test_simhash_planted_twins_at_scale(spark):
    """200k docs through the r9 row-local SimHash + block-pair join:
    every planted twin at controlled Hamming distance 4-6 must
    surface, and the fingerprint stage must stay shuffle-free on a
    well-partitioned input (the rewrite's contract off the toy
    fixture)."""
    from datafusion_randgen_spark import plans

    n = 200_000
    docs = spark.range(0, n, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), ((F.col("id") * (j + 7)) % 9973).cast("string"))
                for j in range(8)
            ],
        ).alias("text"),
    )
    fps = dedup.simhash(docs).localCheckpoint(eager=True)
    assert plans.exchange_count(dedup.simhash(docs)) == 0
    # twins at exact Hamming 4 + id % 3 (the d_simhash_r6 mask design)
    r = (F.lit(4) + F.col("id") % 3).cast("int")
    mask = F.lit(0).cast("long")
    for k in range(6):
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST((id * 7 + {k * 13}) % 64 AS INT))"
        )
        mask = mask + F.when(F.lit(k) < r, bit).otherwise(F.lit(0).cast("long"))
    twins = fps.select(
        (F.col("id") + 1_000_000).alias("id"),
        F.col("simhash").bitwiseXOR(mask).alias("simhash"),
    )
    pairs = dedup.simhash_pairs_within(fps.unionByName(twins), max_hamming=6)
    planted = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1_000_000)
        & (F.col("id_a") < 1_000_000)
    )
    got = planted.agg(
        F.count("*").alias("n"), F.sum("hamming").alias("hs")
    ).collect()[0]
    assert got.n == n
    assert got.hs == 4 * n + sum(i % 3 for i in range(n))


# ---------------------------------------------------------------------------
# Cross-scale trend (VERDICT r9 task 5): the three heaviest dedup ops at
# ~200k AND ~1M docs, each timed, so SCALE_SMOKE.json carries two scale
# points per op and a verdict can read a scaling exponent instead of a
# single number.  Timings go to $SPARK_GRAFT_TREND_OUT (JSONL, written
# by scripts/record_scale_smoke.py's run); invariants assert at BOTH
# scales regardless.

TREND_PAIRS = 1_000


def _truncate_trend_file() -> None:
    """Truncate $SPARK_GRAFT_TREND_OUT (ADVICE r18): a stale file left
    by a crashed earlier run — possibly with a pre-r18 mixed schema —
    must not leak into this run's recording.
    scripts/record_scale_smoke.py deletes the file before launching
    pytest, but a DIRECT ``pytest tests/test_scale_smoke.py``
    invocation with the env var set used to append to whatever was
    already there.  A failed truncation is warned, not swallowed (code
    review r19): a silently skipped truncation would reproduce the
    exact stale-schema leak this exists to prevent."""
    path = os.environ.get("SPARK_GRAFT_TREND_OUT")
    if path:
        try:
            open(path, "w").close()
        except OSError as exc:
            import sys

            sys.stderr.write(
                f"test_scale_smoke: could not truncate trend file "
                f"{path} ({exc}); stale lines may leak into this "
                "recording\n"
            )


@pytest.fixture(scope="module", autouse=True)
def _fresh_trend_file():
    """Module-scoped autouse: runs once, and only when the opt-in gate
    actually admits a test (skipped tests pull no fixtures).  The work
    lives in :func:`_truncate_trend_file` so the harness unit test
    calls a plain function instead of reaching into pytest's fixture
    wrapper internals (code review r19)."""
    _truncate_trend_file()
    yield


def _record_trend(
    op: str, n_docs: int, value: float, kind: str = "sec"
) -> None:
    """Append one trend point to $SPARK_GRAFT_TREND_OUT.

    ``kind`` (ADVICE r17): wall-time points are the default
    (``"sec"``); NON-time series — candidate-pair row counts
    (``"count"``), informational ratios (``"ratio"``) — tag the line
    so the recorder routes them into the sibling
    ``trend_counts_by_ndocs`` map instead of silently overloading the
    seconds-valued ``trend_sec_by_ndocs`` schema (28.9M "sec" was
    legal but a trap for any consumer assuming wall times)."""
    import json

    path = os.environ.get("SPARK_GRAFT_TREND_OUT")
    if path:
        line = {"op": op, "n_docs": n_docs}
        if kind == "sec":
            line["sec"] = round(value, 2)
        else:
            # code review r18: a count/ratio must not ride in a field
            # NAMED "sec" either — the schema split has to hold at
            # line granularity, not just in the aggregated maps
            line["value"] = round(value, 2)
            line["kind"] = kind
        with open(path, "a") as fh:
            fh.write(json.dumps(line) + "\n")


@pytest.fixture(scope="module", params=[200_000, 1_000_000], ids=["200k", "1m"])
def trend_docs(spark, request):
    """n synthetic docs + 1000 planted exact-twin pairs (twin of doc i
    is doc i+n), checkpointed so generation isn't billed to the ops."""
    from datafusion_randgen_spark.sources.synthetic import synthetic_table

    n = request.param
    base = synthetic_table(
        spark, n,
        {"w1": {"kind": "string_alpha", "length": 40}},
        seed=17, num_partitions=32,
    ).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.substring("w1", i * 5 + 1, 5) for i in range(8)]
        ).alias("text"),
    )
    twins = base.filter(F.col("doc_id") < TREND_PAIRS).select(
        (F.col("doc_id") + n).alias("doc_id"), "text"
    )
    docs = base.unionByName(twins).localCheckpoint(eager=True)
    yield n, docs
    docs.unpersist()


def test_trend_minhash_lsh(trend_docs):
    import time

    n, docs = trend_docs
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_dedup_pairs(docs, threshold=0.9)
    found = {
        (r.id_a, r.id_b)
        for r in pairs.filter(F.col("jaccard") >= 0.999).collect()
    }
    sec = time.perf_counter() - t0
    assert {(i, i + n) for i in range(TREND_PAIRS)} <= found
    _record_trend("minhash_lsh_pairs", n, sec)


def test_trend_exact_substring(trend_docs):
    import time

    n, docs = trend_docs
    t0 = time.perf_counter()
    spans = dedup.exact_substring_spans(docs, min_len=5)
    full = {
        r.doc_id
        for r in spans.filter(
            (F.col("span_start") == 0) & (F.col("span_len") == 8)
        ).collect()
    }
    sec = time.perf_counter() - t0
    # every planted twin's WHOLE 8-token text occurs twice -> both
    # members carry one maximal full-length span
    planted_ids = set(range(TREND_PAIRS)) | {i + n for i in range(TREND_PAIRS)}
    assert planted_ids <= full
    _record_trend("exact_substring_spans", n, sec)


def test_trend_skew_routed_dedup(trend_docs):
    import time

    n, docs = trend_docs
    # plant the hot key row-locally on the shared corpus: every
    # doc_id % 4 == 0 becomes the same boilerplate page (n % 4 == 0 at
    # both scales, so a hot base doc's twin is hot too -> 250 extra)
    skew = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.lit("hot boilerplate page"))
        .otherwise(F.col("text")),
    )
    t0 = time.perf_counter()
    labeled = dedup.skew_routed_dedup_labels(skew, heavy_min_count=1000)
    agg = labeled.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("is_heavy_key").cast("long")).alias("hot"),
        F.count_distinct("dedup_key").alias("groups"),
        F.max("group_size").alias("max_gs"),
        F.sum(
            (F.col("is_heavy_key") & (F.col("keeper") != 0)).cast("long")
        ).alias("bad_keeper"),
    ).collect()[0]
    sec = time.perf_counter() - t0
    hot_twins = sum(1 for i in range(TREND_PAIRS) if i % 4 == 0)
    assert agg.rows == n + TREND_PAIRS
    assert agg.hot == n // 4 + hot_twins
    assert agg.max_gs == n // 4 + hot_twins
    assert agg.groups == 1 + (n - n // 4)
    assert agg.bad_keeper == 0
    _record_trend("skew_routed_dedup", n, sec)


# Similarity-family cross-scale trend (VERDICT r10 task 4): SemDeDup
# and IVF-PQ ADC search at 200k AND 1M vectors, invariants green at
# both scales, wall time recorded per point.

@pytest.fixture(
    scope="module", params=[200_000, 1_000_000], ids=["v200k", "v1m"]
)
def trend_vecs(spark, request):
    """n cluster-structured unit vectors + 1000 planted exact twins
    (twin of vec i is vec i+n), checkpointed so generation isn't
    billed to the ops."""
    from datafusion_randgen_spark.functions.vectors import (
        synthetic_embeddings,
    )

    n = request.param
    base = synthetic_embeddings(
        spark, n=n, dim=16, n_clusters=32, noise=0.05, seed=23,
        num_partitions=32,
    ).select("vec_id", "embedding")
    twins = base.filter(F.col("vec_id") < TREND_PAIRS).select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding"
    )
    vecs = base.unionByName(twins).localCheckpoint(eager=True)
    yield n, vecs
    vecs.unpersist()


def test_trend_semantic_dedup(trend_vecs):
    """SemDeDup with k grown ∝ corpus (the paper's contract: ~n/50
    clusters keeps the cluster-local pair cost ~25n) — the planted
    exact twin of vec i MUST land in vec i's cluster (identical
    vectors, identical argmin) and be pruned at any threshold, and
    every cluster's lowest-id member must survive.

    Expected trend: SUPERLINEAR by the algorithm's own construction —
    with k ∝ n the flat assign is O(n·k) = O(n²/50) flops, which is
    SemDeDup's real cost envelope on a flat quantizer (the paper runs
    the same flat/IVF assign on GPUs; the exponent is the algorithm's,
    not the Spark shape's).  What this trend validates is the SPARK
    shape: vectors never shuffle, driver state stays k×dim, the pair
    pass stays ~25n rows — so the wall-time ratio at 5× data should
    track the ~16× assign-flop ratio, not blow past it (memory
    exhaustion, collect, or pair explosion would).

    Arithmetic caveat (ADVICE r11): ``clustering.argmin_d2`` switches
    from the full-matrix path to the chunked streaming path at k>2048
    — the chunked path drops the row-constant ||M||² term from
    comparisons, so NEAR-TIE argmins are not byte-stable across that
    boundary.  With k = n/50 the boundary sits at n ≈ 102k, below both
    trend points (both run chunked), but a future byte-level
    cross-scale oracle must not assume assignment stability against a
    k≤2048 run even with identical centroids; this trend asserts
    INVARIANTS (twin co-clustering, exemplar rule) only, which hold on
    either path because planted twins are exact-equal vectors."""
    import time

    n, vecs = trend_vecs
    k = max(64, n // 50)
    t0 = time.perf_counter()
    out = dedup.semantic_dedup(
        vecs, threshold=0.99, k=k, iterations=1
    ).localCheckpoint(eager=True)
    agg = out.agg(
        F.count("*").alias("rows"),
        F.sum((~F.col("keep")).cast("long")).alias("dropped"),
        F.sum(
            ((F.col("vec_id") >= n) & F.col("keep")).cast("long")
        ).alias("twins_kept"),
    ).collect()[0]
    sec = time.perf_counter() - t0
    assert agg.rows == n + TREND_PAIRS
    assert agg.twins_kept == 0  # every planted twin pruned
    assert agg.dropped >= TREND_PAIRS
    # the exemplar rule: each cluster's lowest-id member is kept
    mins = out.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
    assert out.join(mins, ["cluster", "vec_id"]).filter(
        ~F.col("keep")
    ).count() == 0
    _assert_pair_envelope(out, n, k, "semantic_dedup")
    out.unpersist()
    _SEMDEDUP_UNCAPPED_SEC[n] = sec
    _record_trend("semantic_dedup", n, sec)


def _require_pair_rows(pair_rows, op: str):
    """ADVICE r17: ``F.sum`` over an EMPTY frame is SQL NULL → Python
    None, so a pipeline that wrongly emitted zero rows used to crash
    the envelope check with a bare TypeError — and coercing the None
    to 0 would instead make the envelope pass vacuously.  An empty
    dedup output is itself a failure; say so explicitly."""
    assert pair_rows is not None, (
        f"{op}: pair-envelope input frame is EMPTY (sum over zero "
        "cluster rows returned NULL) — the dedup op emitted no output, "
        "which is itself a failure, not an envelope pass"
    )
    return float(pair_rows)


def _assert_pair_envelope(out, n: int, k_budget: int, op: str) -> None:
    """Candidate-pair COUNT backstop (ADVICE r16): the r16 kcap-gate
    rework moved the scaling asserts onto same-kernel assign timings,
    which left the pair path (the capped run's dominant cost) covered
    only by structural invariants — a pair explosion or candidate-join
    regression would have passed silently.  This asserts the
    host-balance-free quantity directly: the cluster-local self-join
    scores exactly Σ c·(c−1)/2 candidate rows (``dedup.py``'s
    ``__xid > __yid`` filter), which for the CONFIGURED budget of
    ``k_budget`` clusters is ~n²/(2k) when cells stay bounded.  Slack
    10× absorbs k-means cell-size dispersion on the 32-blob fixture;
    the failure modes this exists for read orders of magnitude over
    it (all-in-one-cluster ⇒ n²/2, i.e. k_budget/10 ≈ 1000× over the
    envelope at the 1m point).  Deliberately keyed to the configured
    budget, NOT count_distinct(cluster): a degenerate clustering must
    not widen its own envelope.  A count, not a timing — host speed
    never flips it.

    The trend record reuses the fixture ``n`` as its key so the
    ``*_pair_rows`` point aligns with its wall-time siblings, but is
    tagged ``kind="count"`` (ADVICE r17) so the recorder files it in
    ``trend_counts_by_ndocs``, keeping ``trend_sec_by_ndocs``
    seconds-only."""
    n_tot = n + TREND_PAIRS
    pair_rows = _require_pair_rows(
        out.groupBy("cluster")
        .count()
        .agg(
            F.sum(
                F.col("count") * (F.col("count") - 1) / 2
            ).alias("p")
        )
        .collect()[0]["p"],
        op,
    )
    _record_trend(f"{op}_pair_rows", n, pair_rows, kind="count")
    envelope = 10 * n_tot * n_tot / (2 * k_budget)
    assert pair_rows <= envelope, (
        f"{op}: candidate-pair volume {pair_rows:.3g} exceeds the "
        f"~n²/2k envelope {envelope:.3g} (n={n_tot}, k={k_budget}) — "
        f"pair explosion or candidate-join regression"
    )


# uncapped wall times shared with the k_cap test below; module-scoped
# param ordering runs the 200k cohort before the 1m cohort, so the
# baseline point is present when the capped test needs it (and the
# capped test skips gracefully under a single-param selection)
_SEMDEDUP_UNCAPPED_SEC: dict[int, float] = {}


def test_trend_semantic_dedup_kcap(trend_vecs, spark):
    """SemDeDup with the cluster budget CAPPED (VERDICT r11 task 4):
    k_cap = 10_000 binds at the 1m point (n/50 = 20_000 → 10_000),
    halving the assign pass's O(n·k) flops — the paper's own
    billion-scale posture is a fixed cluster budget.  The correctness
    invariants are k-independent — exact-twin vectors share an argmin
    at ANY k, so every planted twin is still pruned and every cluster
    keeps its lowest-id exemplar — and ``k_used ≤ k_cap`` proves the
    cap actually bound end-to-end.

    Scaling gate REWORKED in r16.  Until r15 this test asserted two
    END-TO-END wall ratios (capped-1m ≤ 5.5× the uncapped-200k
    baseline; capped ≤ 0.9× uncapped at the same n).  Both encoded the
    r12 host's cost balance, not a property of the code: the capped
    run deliberately TRADES assign flops (halved) for candidate-pair
    volume (doubled — Σ|cluster|² ≈ n²/k), so its wall clock is
    dominated by the JVM join + Arrow cosine pair path while the
    uncapped run is dominated by BLAS assign matmuls.  On the r16 host
    the matmul-heavy paths ran ~2× faster than r15 while the
    pair-volume path barely moved (uncapped 1m 187.7→120.0s, capped
    pinned 131.8→127.4s on byte-identical code), flipping both ratios
    with no regression anywhere — reproduced in two isolated runs.
    The asserts below test the cap's ACTUAL contract instead, with
    same-kernel same-run comparisons that are host-balance-free:

    * linear in k — argmin_d2 timed DRIVER-LOCAL (r18) on the same
      sample at k_cap vs 2·k_cap centroids (theory 2×; assert ≤
      0.8× per ADVICE r18, min-of-10 — a kernel that silently
      stopped scaling with k reads ~1.0 and fails).  Until r18 this
      arm was asserted on the full
      distributed shape, whose k-independent Arrow/python-worker cost
      made the pass condition a host cost-balance inequality that
      false-tripped two rounds running on byte-identical kernels —
      see the inline comment at the assert;
    * linear in n — the DISTRIBUTED k_cap assign at n vectors vs n/5
      vectors must scale ≈5× (assert ≤ 5 × 1.4 slack — a super-linear
      (quadratic) assign path reads ≥25× the n/5 point and fails;
      transfer and flops both scale with n, so this one is
      balance-safe).

    End-to-end wall and the old ratio-vs-200k are still RECORDED as
    informational trends for cross-round comparison.  The pair path —
    the capped run's dominant cost — gets its own host-balance-free
    tripwire in r17 (ADVICE r16): ``_assert_pair_envelope`` bounds the
    candidate-pair ROW COUNT at ~n²/2k_cap, a count no host speed can
    flip."""
    import time

    import numpy as np
    import pandas as pd

    from datafusion_randgen_spark.operators import clustering

    n, vecs = trend_vecs
    k_cap = 10_000
    if n // 50 <= k_cap:
        pytest.skip(
            "cap does not bind below k_cap*50 vectors — the uncapped "
            "trend point is this exact configuration"
        )
    t0 = time.perf_counter()
    out = dedup.semantic_dedup(
        vecs, threshold=0.99, k=max(64, n // 50), iterations=1,
        k_cap=k_cap,
    ).localCheckpoint(eager=True)
    agg = out.agg(
        F.count("*").alias("rows"),
        F.sum(
            ((F.col("vec_id") >= n) & F.col("keep")).cast("long")
        ).alias("twins_kept"),
        F.count_distinct("cluster").alias("k_used"),
    ).collect()[0]
    sec = time.perf_counter() - t0
    assert agg.rows == n + TREND_PAIRS
    assert agg.twins_kept == 0  # every planted twin pruned
    assert agg.k_used <= k_cap  # the cap actually bound
    mins = out.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
    assert out.join(mins, ["cluster", "vec_id"]).filter(
        ~F.col("keep")
    ).count() == 0
    _assert_pair_envelope(out, n, k_cap, "semantic_dedup_kcap")
    out.unpersist()
    _record_trend("semantic_dedup_kcap", n, sec)
    base = _SEMDEDUP_UNCAPPED_SEC.get(200_000)
    if base:
        # informational only since r16 (see docstring): the ratio mixes
        # two different bottleneck profiles; kind="ratio" (ADVICE r17)
        # routes it to trend_counts_by_ndocs with the other non-time
        # series so trend_sec_by_ndocs stays seconds-only
        _record_trend(
            "semantic_dedup_kcap_ratio_vs_200k", n, sec / base,
            kind="ratio",
        )

    # ---- assign-pass discriminators (r16) ----
    dim = 16  # matches the trend_vecs fixture
    rng = np.random.default_rng(7)

    def timed_assign(n_centroids: int, frame) -> float:
        """Wall seconds for ONE assign pass of ``frame`` against
        ``n_centroids`` synthetic centroids — the exact argmin_d2
        chunked kernel + mapInPandas shape semantic_dedup uses, timed
        in isolation.  Synthetic centroids are fine: assign cost is
        independent of where the centroids came from."""
        C = rng.standard_normal((n_centroids, dim))
        bc = spark.sparkContext.broadcast(C)

        def go(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                M = np.vstack(pdf["embedding"].to_numpy()).astype(
                    np.float64
                )
                a, _ = clustering.argmin_d2(M, bc.value)
                yield pd.DataFrame({"cluster": a.astype("int32")})

        try:
            t0 = time.perf_counter()
            frame.select("embedding").mapInPandas(go, "cluster int").count()
            return time.perf_counter() - t0
        finally:
            # ADVICE r16: 6 of these per run, up to 20000×16 float64
            # each — release driver/executor copies instead of pinning
            # them for the rest of the module-scoped session
            bc.destroy(blocking=False)

    small_frame = vecs.filter(F.col("vec_id") < n // 5)
    # Two timings per arm, min taken, arms INTERLEAVED (r17): the
    # sequential layout (both t_cap reps, then both t_2cap reps, …)
    # exposed the ratio to monotone in-suite pressure — this test runs
    # right after the ~4-minute uncapped v1m run in the same JVM, and
    # in the r17 smoke the decaying GC/memory pressure landed entirely
    # on the first arm (t_cap 54.8s vs t_2cap 53.6s in-suite, assert
    # PASSED on an isolated re-run of byte-identical code).  A
    # palindrome layout (cap→2cap→n5→n5→2cap→cap) gives every arm the
    # same mean position, so monotone drift in EITHER direction leaves
    # each arm one well-placed rep for the min — the same
    # decorrelation idea as bench.py's per-pass order shuffle, applied
    # at rep granularity.
    arms = {
        "cap": lambda: timed_assign(k_cap, vecs),
        "2cap": lambda: timed_assign(2 * k_cap, vecs),
        "n5": lambda: timed_assign(k_cap, small_frame),
    }
    reps_by_arm: dict[str, list[float]] = {a: [] for a in arms}
    for name in [*arms, *reversed(arms)]:
        reps_by_arm[name].append(arms[name]())
    t_cap = min(reps_by_arm["cap"])
    t_2cap = min(reps_by_arm["2cap"])
    t_cap_small = min(reps_by_arm["n5"])
    _record_trend("kcap_assign_sec", n, t_cap)
    _record_trend("kcap_assign_2k_sec", n, t_2cap)
    _record_trend("kcap_assign_n5_sec", n // 5, t_cap_small)
    assert t_cap <= 5 * 1.4 * t_cap_small, (
        f"capped assign is not ≈linear in n: {t_cap:.1f}s at {n} vs "
        f"{t_cap_small:.1f}s at {n // 5}"
    )

    # k-linearity asserted on the KERNEL alone, driver-local (r18).
    # The r16 distributed formulation (t_cap <= 0.75 * t_2cap over the
    # full mapInPandas shape) decomposes as t(k) = a + b·k where a is
    # the k-INDEPENDENT Arrow transfer + python-worker cost; its pass
    # condition is algebraically a <= 2·b·k_cap — a host cost-balance
    # property, the exact class the r16 rework set out to ban.  It
    # false-tripped on byte-identical kernels two rounds running (r17
    # in-suite, isolated rerun passed; r18 in-smoke 47.7s vs 59.3s =
    # 0.80 — decomposed a≈36s, b·k≈12s on a slow-python-worker host).
    # Timing argmin_d2 directly on a driver-local sample removes `a`
    # from both sides, so the theoretical 2× flop separation is
    # actually observable on ANY host balance: a kernel that silently
    # stopped scaling with k reads ~1.0 and fails.  The distributed
    # arms stay RECORDED (trend lines above) for cross-round
    # comparison; the distributed assert that remains is n-linearity,
    # whose dominant terms (transfer AND flops) both scale with n.
    # Both k points sit above argmin_d2's chunk=2048 boundary, so the
    # timed path is the chunked streaming path semantic_dedup runs.
    # Sample sized at 5k rows: per-chunk temporaries stay ~80 MB —
    # at 20k rows the 330 MB (rows × chunk) float64 intermediates made
    # the timing allocator/bandwidth-bound and the reps swung 3×
    # (measured while landing this); at 5k the min-of-N ratio
    # reproduces at 0.53-0.65 across independent processes.  ADVICE
    # r18: 0.65 vs a 0.75 line was ~13% headroom on a ~0.15s
    # micro-timing — tighter than this file's other timing asserts —
    # so the line moved to 0.8 and the palindrome runs 5 passes
    # (min-of-10 per arm, still <4s total); a kernel that stopped
    # scaling with k still reads ~1.0 and fails by a wide margin.
    sample = rng.standard_normal((5_000, dim))
    kernel_cs = {k_cap: rng.standard_normal((k_cap, dim)),
                 2 * k_cap: rng.standard_normal((2 * k_cap, dim))}

    def kernel_sec(kk: int) -> float:
        t0 = time.perf_counter()
        clustering.argmin_d2(sample, kernel_cs[kk])
        return time.perf_counter() - t0

    for kk in kernel_cs:  # warm BLAS/allocator outside the timed reps
        kernel_sec(kk)
    kernel_reps: dict[int, list[float]] = {kk: [] for kk in kernel_cs}
    # palindrome rep layout, min taken — same decorrelation as the
    # distributed arms above
    for kk in [*kernel_cs, *reversed(kernel_cs)] * 5:
        kernel_reps[kk].append(kernel_sec(kk))
    tk = min(kernel_reps[k_cap])
    tk2 = min(kernel_reps[2 * k_cap])
    _record_trend("kcap_kernel_k_sec", n, tk)
    _record_trend("kcap_kernel_2k_sec", n, tk2)
    assert tk <= 0.8 * tk2, (
        f"assign kernel stopped scaling with k: {tk:.3f}s at k={k_cap} "
        f"vs {tk2:.3f}s at k={2 * k_cap} on the same driver-local "
        f"{len(sample)}-row sample"
    )


def test_trend_ivfpq_adc_search(trend_vecs):
    """IVF-PQ train + cell-probed ADC search at scale: per query (a
    corpus vector), within its own cell its own row attains the
    minimum ADC distance (the s_ivfpq_search invariant), and scored
    rows equal the probed inverted-list sizes — cost ∝ probed cells,
    never the corpus."""
    import time

    import numpy as np
    from datafusion_randgen_spark.operators import similarity

    n, vecs = trend_vecs
    spark = vecs.sparkSession
    t0 = time.perf_counter()
    coarse, pq_c, _, asg = similarity.ivfpq_train(
        vecs, n_cells=16, m=4, k=16, iterations=2
    )
    asg = asg.select("vec_id", "cell", "codes").localCheckpoint(eager=True)
    sd = pq_c.shape[2]
    qs = vecs.filter(F.col("vec_id") % 9973 == 0).orderBy("vec_id").limit(5).collect()
    luts, own_cell = [], {}
    for r in qs:
        v = np.asarray(r["embedding"], dtype=np.float64)
        d2 = ((v[None, :] - coarse) ** 2).sum(axis=1)
        own_cell[r["vec_id"]] = int(d2.argmin())
        for c_id in np.argsort(d2)[:2]:
            rq = v - coarse[int(c_id)]
            lut = [
                [
                    float(((rq[j * sd:(j + 1) * sd] - pq_c[j, c]) ** 2).sum())
                    for c in range(pq_c.shape[1])
                ]
                for j in range(pq_c.shape[0])
            ]
            luts.append((r["vec_id"], int(c_id), lut))
    luts_df = spark.createDataFrame(
        luts, "query_id long, cell int, lut array<array<double>>"
    )
    scores = similarity.ivfpq_adc_scores(asg, luts_df).localCheckpoint(
        eager=True
    )
    sec = time.perf_counter() - t0
    # scored rows == sum of probed list sizes (cell-probed, not corpus)
    cell_sizes = {r.cell: r.n for r in asg.groupBy("cell").count().withColumnRenamed("count", "n").collect()}
    expected = sum(cell_sizes.get(c, 0) for _, c, _ in luts)
    assert scores.count() == expected
    # own-cell minimum: the query's own row sits at the min ADC
    cells_df = spark.createDataFrame(
        list(own_cell.items()), "query_id long, own_cell int"
    )
    oc = (
        scores.join(F.broadcast(cells_df), "query_id")
        .join(
            asg.select(F.col("vec_id").alias("neighbor_id"), "cell"),
            "neighbor_id",
        )
        .filter(F.col("cell") == F.col("own_cell"))
    )
    per_q = oc.groupBy("query_id").agg(F.min("adc_d2").alias("min_d2"))
    own = oc.filter(F.col("neighbor_id") == F.col("query_id")).select(
        "query_id", F.col("adc_d2").alias("own_d2")
    )
    bad = per_q.join(own, "query_id").filter(
        F.col("own_d2") > F.col("min_d2") + F.lit(1e-9)
    )
    assert bad.count() == 0
    scores.unpersist()
    asg.unpersist()
    _record_trend("ivfpq_adc_search", n, sec)
