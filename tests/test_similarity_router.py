"""The auto-routing similarity front door (VERDICT r4 item 1): pure
routing rules, log-N plane sizing, and dispatch fidelity — each branch
must return exactly what its underlying variant returns, so the router
adds safety without changing any measured/gated behavior."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.similarity import (
    cosine_topk_blas,
    choose_strategy,
    ivf_assignments,
    ivf_topk,
    lsh_topk,
    resolve_n_planes,
    topk,
)
from distributed_mapreduce__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


# ---------------------------------------------------------------- pure rules


def test_choose_strategy_routing():
    # tiny problem → exact BLAS (exact beats approximate at equal cost)
    assert choose_strategy(1_000, 10) == "blas"
    # Q collectible and Q·N inside the matmul budget → still exact BLAS
    # even though the pair-join budget is long gone
    assert choose_strategy(10_000_000, 100) == "blas"
    # Q too large to collect but few pairs → distributed pair-join exact
    assert choose_strategy(100, 100_000) == "exact"
    # over every exact budget, no index → LSH (zero-training scale path)
    assert choose_strategy(1_000_000_000, 1_000_000) == "lsh"
    # same scale WITH a pre-trained coarse quantizer → IVF (reuse the
    # index; auto never trains one behind the caller's back)
    assert choose_strategy(1_000_000_000, 1_000_000, has_quantizer=True) == "ivf"


def test_resolve_n_planes_rule():
    # degenerate / empty corpus clamps to the floor
    assert resolve_n_planes(0) == 4
    assert resolve_n_planes(1) == 4
    # exact power-of-two occupancy: N = 32 · 2^8 → 8 planes
    assert resolve_n_planes(32 * 2**8) == 8
    # the rule is ceil(log2(N / target_bucket_size)) within clamps
    for n in (605, 6050, 60500, 10**7):
        want = max(4, min(24, math.ceil(math.log2(n / 32))))
        assert resolve_n_planes(n) == want
    # monotone in N and clamped at both ends
    vals = [resolve_n_planes(n) for n in (10, 1_000, 10**6, 10**9, 10**12)]
    assert vals == sorted(vals)
    assert vals[0] == 4 and vals[-1] == 24


# ------------------------------------------------------------- dispatch


def test_auto_routes_fixture_to_exact_blas(spark):
    """At fixture scale auto must pick the exact BLAS path and return
    its pair set bit-for-bit (same schema, same tie-break)."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    auto = topk(emb, queries, k=10, strategy="auto")
    direct = cosine_topk_blas(emb, queries, k=10)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, direct.collect()))


def test_lsh_branch_applies_log_n_plane_rule(spark):
    """strategy='lsh' resolves n_planes=None to resolve_n_planes(N) —
    the routed result must equal a direct lsh_topk call with that
    explicit plane count (dispatch adds nothing, removes nothing)."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    n = emb.count()
    routed = _pairs(topk(emb, queries, k=10, strategy="lsh"))
    direct = _pairs(
        lsh_topk(emb, queries, n_planes=resolve_n_planes(n), multiprobe=True,
                 probe_radius=2, k=10)
    )
    assert routed == direct
    # corpus_count passthrough short-circuits the count job and must
    # not change the result
    counted = _pairs(topk(emb, queries, k=10, strategy="lsh", corpus_count=n))
    assert counted == routed


def test_ivf_branch_reuses_quantizer(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    quant = ivf_assignments(emb, k=8)
    routed = _pairs(
        topk(emb, queries, k=10, strategy="ivf", n_cells=8, nprobe=2, quantizer=quant)
    )
    direct = _pairs(
        ivf_topk(emb, queries, n_cells=8, nprobe=2, k=10, quantizer=quant)
    )
    assert routed == direct


def test_unknown_strategy_raises():
    with pytest.raises(ValueError, match="unknown strategy"):
        topk(None, None, strategy="annoy")


def test_routed_lsh_recall_on_clustered_vectors(spark):
    """The engine-chosen LSH config (multiprobe + log-N planes) must
    deliver usable recall on CLUSTERED vectors — the data shape real
    embedding corpora have. 30 tight clusters (0.05/dim noise →
    within-cluster sims ~0.86) x 40 members, queries from the corpus;
    measured 0.81 at radius 1 and higher at the routed radius 2,
    gate at 0.75.

    Hyperplane LSH recall is sim-bounded: per-plane agreement is
    1 - θ/π, so neighbors at sim ~0.5 (θ=60°) are intrinsically hard
    for ANY plane count — that regime belongs to IVF (clustered probing
    is sim-agnostic), which is why the router prefers IVF when handed a
    quantizer."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(30, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci, c in enumerate(centers):
        members = c + 0.05 * rng.normal(size=(40, 64))
        members /= np.linalg.norm(members, axis=1, keepdims=True)
        rows += [(ci * 40 + j, members[j].tolist()) for j in range(40)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8).cache()
    queries = corpus.filter(F.col("vec_id") % 60 == 0).cache()

    exact = _pairs(cosine_topk_blas(corpus, queries, k=10))
    got = _pairs(topk(corpus, queries, k=10, strategy="lsh"))
    recall = len(got & exact) / len(exact)
    assert recall >= 0.75, f"routed-LSH recall too low: {recall}"
    corpus.unpersist()
    queries.unpersist()


def test_probe_radius_two_recovers_recall(spark):
    """The recall dial at high plane counts: radius-2 probing must
    strictly beat single-bit probing on clusters too loose for
    radius 1 (0.08/dim noise → sims ~0.7, measured 0.58 vs 0.86)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(30, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci, c in enumerate(centers):
        members = c + 0.08 * rng.normal(size=(40, 64))
        members /= np.linalg.norm(members, axis=1, keepdims=True)
        rows += [(ci * 40 + j, members[j].tolist()) for j in range(40)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8).cache()
    queries = corpus.filter(F.col("vec_id") % 60 == 0).cache()

    exact = _pairs(cosine_topk_blas(corpus, queries, k=10))
    r1 = _pairs(lsh_topk(corpus, queries, multiprobe=True, probe_radius=1, k=10))
    r2 = _pairs(lsh_topk(corpus, queries, multiprobe=True, probe_radius=2, k=10))
    rec1 = len(r1 & exact) / len(exact)
    rec2 = len(r2 & exact) / len(exact)
    assert rec2 >= rec1, (rec1, rec2)
    assert rec2 >= 0.75, rec2
    corpus.unpersist()
    queries.unpersist()


# ----------------------------------------------- plan shape (the 100 TB bar)


def _static_plan(df) -> str:
    """The initial (pre-execution) physical plan — what the optimizer
    was FORCED into. AQE may still convert joins to broadcast at
    runtime from observed sizes; that is exactly the desired behavior,
    so these tests pin only what is forced, not what AQE elects."""
    return df._jdf.queryExecution().executedPlan().toString()


def _with_broadcast_disabled(spark):
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    return ctx()


def test_lsh_topk_never_forces_query_side_broadcast(spark):
    """VERDICT r5 lead item: the LSH branch is what auto picks when Q
    is too big to broadcast, so nothing in it may FORCE a broadcast
    hash join. With the size-based broadcast estimator disabled, any
    HashedRelationBroadcastMode exchange in the plan could only come
    from a hint — the intentional planes/mask broadcasts are
    nested-loop joins with IdentityBroadcastMode and stay allowed."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    with _with_broadcast_disabled(spark):
        df = lsh_topk(
            emb, queries, n_planes=6, multiprobe=True, probe_radius=2, k=5
        )
        plan = _static_plan(df)
    assert "HashedRelationBroadcastMode" not in plan, plan
    # the probe-expanded query side exists only as id pairs pre-match:
    # the bucket equi-join must be present as a shuffled join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_ivf_topk_never_forces_query_side_broadcast(spark):
    """Same pin for the IVF branch (docstring claims corpus-scale Q):
    the probe set joins on cell unhinted; only the centroid table (a
    nested-loop IdentityBroadcastMode broadcast) is forced."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    quant = ivf_assignments(emb, k=4)
    with _with_broadcast_disabled(spark):
        df = ivf_topk(emb, queries, n_cells=4, nprobe=2, k=5, quantizer=quant)
        plan = _static_plan(df)
    assert "HashedRelationBroadcastMode" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


# ------------------------------------------------------- blas direct-call guard


def test_blas_guard_raises_on_oversized_q(spark):
    """VERDICT r5 item 4: a direct cosine_topk_blas call with an
    oversized query side must fail with a descriptive error BEFORE
    collecting (the auto router already refuses this shape)."""
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="max_q"):
        cosine_topk_blas(emb, emb, k=5, max_q=10)
    # a caller-passed count hint is honored without running a count job
    with pytest.raises(ValueError, match="driver OOM"):
        cosine_topk_blas(emb, emb, k=5, query_count=100_000)


def test_blas_guard_allows_bounded_q(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = cosine_topk_blas(emb, queries, k=3, query_count=queries.count())
    assert out.count() > 0
