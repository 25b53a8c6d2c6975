"""LSH near-dup path: full-recall verification against the exact
all-pairs baseline on the fixture corpus, and the plan-shape guarantee
that makes it the 100 TB path (equi-join candidates, never a
cartesian / broadcast-nested-loop join)."""

from __future__ import annotations

from datafusion_randgen_spark.operators import similarity
from datafusion_randgen_spark.queries import QUERIES, _augmented_embeddings
from datafusion_randgen_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.id_a, r.id_b, r.sim) for r in df.collect()}


def test_lsh_near_dup_entry_full_recall_vs_exact(spark):
    """The catalog entry's exact configuration (planted twins, 0.95
    threshold, 16 bits × 4 tables, Hamming-1 probe): deterministic
    seeds ⇒ recall is a fixed number, and it must be 1.0 — every pair
    the O(n²) baseline finds, at identical rounded sims."""
    aug = _augmented_embeddings(spark, SF)
    lsh = similarity.embedding_near_dup_pairs(
        aug, threshold=0.95, dim=64, nbits=16, ntables=4, probe=1
    )
    exact = similarity.embedding_near_dup_pairs_exact(aug, threshold=0.95)
    got, want = _pairs(lsh), _pairs(exact)
    assert len(want) >= 500, "every vector should pair with its planted twin"
    assert got == want


def test_lsh_near_dup_low_threshold_multiprobe_recall(spark):
    """Low-threshold stress: at 0.4 (far below any realistic dedup bar)
    per-bit collision is only ~0.63, so full recall needs coarse codes,
    many tables and multiprobing — 4 bits × 16 tables × Hamming-1 keeps
    per-pair miss ≈ 6e-6.  Verifies the probe machinery actually buys
    the recall it claims."""
    emb = load_table(spark, SF, "embeddings")
    lsh = similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, dim=64, nbits=4, ntables=16, probe=1
    )
    exact = similarity.embedding_near_dup_pairs_exact(emb, threshold=0.4)
    got, want = _pairs(lsh), _pairs(exact)
    assert want, "fixture should have pairs at 0.4 — oracle degenerate otherwise"
    assert got == want


def test_lsh_near_dup_plan_has_no_cartesian(spark):
    """The reason the LSH path exists: candidates come from an equi-join
    on (table, code).  An all-pairs regression would reappear as a
    BroadcastNestedLoopJoin or CartesianProduct node — checked on the
    actual catalog entry."""
    lsh = QUERIES["d_embedding_near_dup"](spark, SF)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_exact_baseline_is_the_cartesian(spark):
    """Sanity: the *_exact baseline really is the all-pairs form the
    oracle computes (so the recall tests above are meaningful)."""
    emb = load_table(spark, SF, "embeddings").limit(50)
    exact = similarity.embedding_near_dup_pairs_exact(emb, threshold=0.4)
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


def test_pq_train_hand_computed(spark):
    """m=2 subspaces over 4-dim vectors with two obvious clusters per
    subspace: codes are the expected centroids, exact twins encode
    identically, vectors sitting ON a converged centroid have ~zero
    reconstruction error, and inertia is non-increasing."""
    rows = [
        (1, [0.0, 0.0, 10.0, 10.0]),
        (2, [10.0, 10.0, 0.0, 0.0]),
        (3, [0.1, 0.0, 10.0, 10.1]),
        (4, [10.1, 10.0, 0.0, 0.1]),
        (5, [0.0, 0.1, 9.9, 10.0]),
        (6, [10.0, 10.1, 0.1, 0.0]),
        (7, [0.0, 0.0, 10.0, 10.0]),   # exact twin of 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C, inertias, asg = similarity.pq_train(df, m=2, k=2, iterations=4)
    assert C.shape == (2, 2, 2)
    out = {r.vec_id: r for r in asg.collect()}
    assert out[7].codes == out[1].codes          # exact twin
    assert out[1].codes != out[2].codes          # opposite clusters
    assert all(len(r.codes) == 2 for r in out.values())
    assert all(0 <= c <= 1 for r in out.values() for c in r.codes)
    assert all(r.recon_se >= 0 for r in out.values())
    assert all(b <= a * (1 + 1e-9) for a, b in zip(inertias, inertias[1:]))
    # converged centroids sit at the cluster means, so the recon error
    # of any vector is bounded by the cluster spread (~0.1 per dim)
    assert max(r.recon_se for r in out.values()) < 0.1


def test_pq_adc_scoring_stays_jvm_and_finds_own_vector(spark):
    """The ADC fold is a pure-Catalyst indexed-array expression — no
    Python eval nodes, no shuffle before the caller's aggregation —
    and a query identical to a corpus vector scores its own row at
    the corpus-wide minimum distance."""
    from datafusion_randgen_spark import plans

    rows = [
        (1, [0.0, 0.0, 10.0, 10.0]),
        (2, [10.0, 10.0, 0.0, 0.0]),
        (3, [0.1, 0.0, 10.0, 10.1]),
        (4, [10.1, 10.0, 0.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C, _, asg = similarity.pq_train(df, m=2, k=2, iterations=3)
    codes = asg.select("vec_id", "codes").localCheckpoint(eager=True)
    import numpy as np

    v = np.array(rows[1][1], dtype=np.float64)
    sd = C.shape[2]
    lut = [
        [float(((v[j * sd : (j + 1) * sd] - C[j, c]) ** 2).sum()) for c in range(2)]
        for j in range(2)
    ]
    luts = spark.createDataFrame([(2, lut)], "query_id long, lut array<array<double>>")
    scores = similarity.pq_adc_scores(codes, luts)
    assert plans.python_eval_nodes(scores) == 0
    got = {r.neighbor_id: r.adc_d2 for r in scores.collect()}
    assert got[2] <= min(got.values()) + 1e-9


def test_ivfpq_residual_encoding_and_cell_probe(spark):
    """Two well-separated cells: the coarse quantizer recovers them,
    residual-PQ codes of an exact twin match its original, and
    cell-probed ADC scores a query's own row at the within-cell
    minimum.  The probe join must stay an equi-join on the cell id."""
    import numpy as np

    from datafusion_randgen_spark import plans

    rows = [
        (1, [0.0, 0.0, 10.0, 10.0]),
        (2, [10.0, 10.0, 0.0, 0.0]),
        (3, [0.2, 0.0, 10.0, 10.2]),
        (4, [10.2, 10.0, 0.0, 0.2]),
        (5, [0.0, 0.2, 9.8, 10.0]),
        (6, [10.0, 10.2, 0.2, 0.0]),
        (7, [0.0, 0.0, 10.0, 10.0]),   # exact twin of 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    coarse, pq_c, inertias, asg = similarity.ivfpq_train(
        df, n_cells=2, m=2, k=2, iterations=3
    )
    out = {r.vec_id: r for r in asg.collect()}
    assert out[7].cell == out[1].cell and out[7].codes == out[1].codes
    assert out[1].cell != out[2].cell
    assert all(b <= a * (1 + 1e-9) for a, b in zip(inertias, inertias[1:]))
    # cell-probed ADC: query = vector 2, probe only its own cell
    v = np.array(rows[1][1], dtype=np.float64)
    cell = int(((v[None, :] - coarse) ** 2).sum(axis=1).argmin())
    rq = v - coarse[cell]
    sd = pq_c.shape[2]
    lut = [
        [float(((rq[j * sd : (j + 1) * sd] - pq_c[j, c]) ** 2).sum()) for c in range(2)]
        for j in range(2)
    ]
    luts = spark.createDataFrame(
        [(2, cell, lut)], "query_id long, cell int, lut array<array<double>>"
    )
    codes = asg.select("vec_id", "cell", "codes").localCheckpoint(eager=True)
    scores = similarity.ivfpq_adc_scores(codes, luts)
    assert plans.python_eval_nodes(scores) == 0
    plan = plans.physical_plan(scores)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    got = {r.neighbor_id: r.adc_d2 for r in scores.collect()}
    # only the probed cell's members are scored, and the query wins
    assert set(got) == {i for i in out if out[i].cell == cell}
    assert got[2] <= min(got.values()) + 1e-9
