"""Semantic dedup: planted paraphrase groups in clustered embedding
space must collapse to one survivor each with high pair recall, unique
vectors must survive untouched, the result must be deterministic, and
the plan must never fall back to an all-pairs join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.semdedup import (
    semantic_dedup,
    semantic_dup_pairs,
)

#: slow tier (round 16): excluded from the driver-window default
#: run; the full suite (pytest -m "") runs and is logged every round.
pytestmark = __import__("pytest").mark.slow

N_GROUPS = 12  # planted duplicate groups of 3 (ids g*100, +1, +2)
N_UNIQUE = 300


@pytest.fixture(scope="module")
def corpus(spark):
    """300 unique vectors around 20 topic centers + 12 planted
    duplicate triples (cosine ≥ ~0.99 within a triple)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(20, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(N_UNIQUE):
        v = centers[i % 20] + 0.25 * rng.normal(size=64)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    for g in range(N_GROUPS):
        base = centers[g % 20] + 0.25 * rng.normal(size=64)
        base /= np.linalg.norm(base)
        for j in range(3):
            v = base + 0.01 * rng.normal(size=64)
            rows.append((1000 + g * 100 + j, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = df.repartition(8).cache()
    df.count()
    return df


def test_planted_pairs_found(corpus):
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dup_pairs(corpus, threshold=0.98, k=8).collect()
    }
    want = {
        (1000 + g * 100 + a, 1000 + g * 100 + b)
        for g in range(N_GROUPS)
        for a, b in ((0, 1), (0, 2), (1, 2))
    }
    # clustering may split a group across cells — the documented recall
    # trade; on this fixture it should be rare
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"semantic pair recall: {recall}"
    # no unique vector should pair with anything at 0.98
    false_pairs = [p for p in got - want if p[0] < 1000 or p[1] < 1000]
    assert not false_pairs, false_pairs[:5]


def test_survivors_one_per_group(corpus):
    kept = {r.vec_id for r in semantic_dedup(corpus, threshold=0.98, k=8).collect()}
    # every unique vector survives
    assert set(range(N_UNIQUE)) <= kept
    # each fully-detected group keeps exactly its min id; allow the
    # rare split group to keep one extra (recall trade), never lose all
    extra = 0
    for g in range(N_GROUPS):
        ids = {1000 + g * 100 + j for j in range(3)}
        surv = kept & ids
        assert min(ids) in surv
        extra += len(surv) - 1
    assert extra <= N_GROUPS // 3, f"too many split groups: {extra}"


def test_deterministic(corpus):
    a = sorted(r.vec_id for r in semantic_dedup(corpus, threshold=0.98, k=8).collect())
    b = sorted(r.vec_id for r in semantic_dedup(corpus, threshold=0.98, k=8).collect())
    assert a == b


def test_no_all_pairs_join(corpus):
    """The pair join must be an equi-join on the cell id — never a
    BroadcastNestedLoopJoin/CartesianProduct over the corpus."""
    plan = semantic_dup_pairs(corpus, threshold=0.98, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fixture_embeddings_run(spark):
    """Smoke over the real fixture table: runs, survivors ≤ corpus,
    survivors + losers partition the ids."""
    from distributed_mapreduce__spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    kept = semantic_dedup(emb, threshold=0.99, k=8)
    nk = kept.count()
    assert 0 < nk <= n
    assert kept.select("vec_id").distinct().count() == nk


def test_projected_clustering_keeps_recall_and_precision(corpus):
    """project_dim=16 runs k-means on a JL reduction (4x less
    clustering work); reported cosines stay EXACT (computed on the
    original vectors) so precision is structural, and the planted
    recall must survive the projection's distortion."""
    got = {
        (r.id_a, r.id_b): r.cos
        for r in semantic_dup_pairs(
            corpus, threshold=0.98, k=8, project_dim=16
        ).collect()
    }
    want = {
        (1000 + g * 100 + a, 1000 + g * 100 + b)
        for g in range(N_GROUPS)
        for a, b in ((0, 1), (0, 2), (1, 2))
    }
    recall = len(set(got) & want) / len(want)
    assert recall >= 0.9, f"projected semantic pair recall: {recall}"
    false_pairs = [p for p in set(got) - want if p[0] < 1000 or p[1] < 1000]
    assert not false_pairs, false_pairs[:5]
    # exact-cosine contract: every reported pair really is >= threshold,
    # bit-identical to the unprojected path's score for shared pairs
    full = {
        (r.id_a, r.id_b): r.cos
        for r in semantic_dup_pairs(corpus, threshold=0.98, k=8).collect()
    }
    shared = set(got) & set(full)
    assert shared and all(got[p] == full[p] for p in shared)


def test_projected_dedup_deterministic(corpus):
    a = sorted(
        r.vec_id
        for r in semantic_dedup(corpus, threshold=0.98, k=8, project_dim=16).collect()
    )
    b = sorted(
        r.vec_id
        for r in semantic_dedup(corpus, threshold=0.98, k=8, project_dim=16).collect()
    )
    assert a == b
    assert set(range(N_UNIQUE)) <= set(a)
