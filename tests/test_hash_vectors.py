"""Feature-hashed document vectors (text_ranking.hashed_doc_vectors):
unit geometry, determinism, and the bridge into the ANN family — a
planted near-duplicate must be the nearest neighbor under the existing
cosine_topk operator with NO trained model anywhere."""

from __future__ import annotations

import math

import pytest

from distributed_mapreduce__spark.operators.text_ranking import (
    hashed_doc_vectors,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox leaps over the lazy dog"),  # near-dup of 1
    (3, "astronomy telescopes resolve distant spiral galaxies tonight"),
    (4, "stock markets closed lower after volatile trading sessions"),
    (5, ""),  # no tokens → no vector row
]


@pytest.fixture(scope="module")
def vecs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r.doc_id: list(r.embedding)
        for r in hashed_doc_vectors(docs, dim=64).collect()
    }


def test_shape_norm_and_empty_doc(vecs):
    assert set(vecs) == {1, 2, 3, 4}  # the token-less doc has no vector
    for v in vecs.values():
        assert len(v) == 64
        assert math.sqrt(sum(x * x for x in v)) == pytest.approx(1.0)


def test_deterministic_across_runs(spark, vecs):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    again = {
        r.doc_id: list(r.embedding)
        for r in hashed_doc_vectors(docs, dim=64).collect()
    }
    assert again == vecs


def test_near_duplicate_tops_cosine(vecs):
    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    sims = {j: cos(vecs[1], vecs[j]) for j in (2, 3, 4)}
    assert max(sims, key=sims.get) == 2
    assert sims[2] > 0.8  # one-word edit stays nearly parallel
    assert sims[3] < 0.5 and sims[4] < 0.5


def test_feeds_ann_operator_end_to_end(spark):
    """The output column is drop-in for the similarity family: run the
    engine's own cosine_topk over hashed vectors and the planted
    near-dup must rank first."""
    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.operators.similarity import cosine_topk

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    emb = hashed_doc_vectors(docs, dim=64).select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") == 1)
    top = cosine_topk(queries, emb, k=2).orderBy("rank").collect()
    # rank 1 is the near-duplicate (self is excluded by the operator)
    assert top[0].neighbor_id == 2


def test_bag_of_words_invariance_vs_lm_order_sensitivity(spark):
    """Contract pair: hashed TF-IDF vectors are bag-of-words (word
    order cannot move them — same corpus-side df, same tf multiset),
    while the n-gram LM is exactly the operator that IS
    order-sensitive. Together they document which tool measures what."""
    from distributed_mapreduce__spark.operators.ngram_lm import (
        ngram_lm_scores,
        train_ngram_lm,
    )

    base = "the quick brown fox jumps over the lazy dog"
    shuffled = "dog lazy the over jumps fox brown quick the"
    docs = spark.createDataFrame(
        [(1, base), (2, shuffled)], "doc_id long, text string"
    )
    vecs = {
        r.doc_id: list(r.embedding)
        for r in hashed_doc_vectors(docs, dim=64).collect()
    }
    assert vecs[1] == pytest.approx(vecs[2])  # identical bag → identical vector

    model = train_ngram_lm(
        spark.createDataFrame([(0, base)], "doc_id long, text string"), n=3
    )
    ppl = {r.doc_id: r.ppl for r in ngram_lm_scores(docs, model).collect()}
    assert ppl[1] < ppl[2]  # order destroyed → perplexity explodes


def test_no_forced_vocabulary_broadcast(spark):
    """VERDICT r7 #2: the document-frequency table is vocabulary-sized
    (one row per distinct term, 10^8+ on a web corpus) so nothing in
    hashed_doc_vectors may FORCE it into a broadcast hash join. With
    the size-based estimator disabled, any HashedRelationBroadcastMode
    in the plan could only come from a hint; the one intentional
    broadcast (the 1-row corpus total `n`) is a nested-loop
    IdentityBroadcastMode join and stays allowed."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = hashed_doc_vectors(docs, dim=64)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "HashedRelationBroadcastMode" not in plan, plan


def test_dense_paths_agree(spark, monkeypatch):
    """The single-aggregation dense path (dim ≤ _DENSE_AGG_MAX_DIM)
    and the wide-dim per-(doc,bucket) fallback are the same operator:
    forcing the fallback at dim=64 must reproduce the fast path's
    vectors exactly."""
    from distributed_mapreduce__spark.operators import text_ranking

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    fast = {
        r.doc_id: r.embedding
        for r in text_ranking.hashed_doc_vectors(docs).collect()
    }
    monkeypatch.setattr(text_ranking, "_DENSE_AGG_MAX_DIM", 0)
    wide = {
        r.doc_id: r.embedding
        for r in text_ranking.hashed_doc_vectors(docs).collect()
    }
    assert fast.keys() == wide.keys()
    for k in fast:
        assert max(
            abs(a - b) for a, b in zip(fast[k], wide[k])
        ) < 1e-9, k
