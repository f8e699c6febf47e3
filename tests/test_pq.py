"""Product quantization: code shape/range, reconstruction beats the
trivial baseline, decode→search recall on clustered vectors, and
seeded determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.quantize import (
    pq_decode,
    pq_encode,
    pq_train,
)
from distributed_mapreduce__spark.sources.tables import load_table

#: slow tier (round 16): excluded from the driver-window default
#: run; the full suite (pytest -m "") runs and is logged every round.
pytestmark = __import__("pytest").mark.slow

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(30, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci, c in enumerate(centers):
        members = c + 0.15 * rng.normal(size=(40, 64))
        members /= np.linalg.norm(members, axis=1, keepdims=True)
        rows += [(ci * 40 + j, members[j].tolist()) for j in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = df.repartition(8).cache()
    df.count()
    return df


def test_codes_shape_and_range(spark):
    emb = load_table(spark, SF, "embeddings")
    cb = pq_train(emb, m=8, k=16)
    assert cb.count() == 8 * 16
    enc = pq_encode(emb, cb)
    assert enc.count() == emb.count()
    stats = enc.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.min("m").alias("m_lo"), F.max("m").alias("m_hi"),
        F.min("lo").alias("lo"), F.max("hi").alias("hi"),
    ).first()
    assert stats.m_lo == stats.m_hi == 8
    assert 0 <= stats.lo and stats.hi <= 15


def _recon_mse(clustered, m, k):
    cb = pq_train(clustered, m=m, k=k)
    dec = pq_decode(pq_encode(clustered, cb), cb).withColumnRenamed(
        "embedding", "recon"
    )
    joined = clustered.join(dec, "vec_id")
    sq = F.aggregate(
        F.zip_with("embedding", "recon", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return joined.select(sq.alias("e")).agg(F.avg("e")).first()[0]


def test_reconstruction_tracks_rate_distortion(clustered):
    """m=8, k=16 spends 32 bits on a 64-d unit vector — rate R = 1/2
    bit/dim, and Gaussian rate-distortion bounds the achievable MSE at
    2^(-2R) = 0.5x the variance, NOT some arbitrary large factor (the
    fixture's cluster structure barely helps: 30 cluster centers
    project near-isotropically onto each 8-d subspace). Measured:
    0.51x. Doubling the bitrate (m=16, k=16 -> 64 bits, R=1) should
    roughly halve distortion again (measured 0.31x). Assert both with
    margin, plus monotonicity."""
    # trivial baseline: reconstruct every vector as the global mean
    mean_vec = np.array(
        clustered.select(
            F.array(*[F.avg(F.col("embedding")[i]) for i in range(64)])
        ).first()[0]
    )
    base_mse = (
        clustered.select(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(float(x)) for x in mean_vec]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("e")
        )
        .agg(F.avg("e"))
        .first()[0]
    )
    mse_32bit = _recon_mse(clustered, m=8, k=16)
    mse_64bit = _recon_mse(clustered, m=16, k=16)
    assert mse_32bit < 0.65 * base_mse, (mse_32bit, base_mse)
    assert mse_64bit < 0.75 * mse_32bit, (mse_64bit, mse_32bit)


def test_decode_then_search_recall(clustered):
    """The memory-bound ANN serving pattern at the standard PQ8x8
    config (m=8, k=256 -> 8 bytes/vector): searching the decoded
    reconstruction alone recovers most of the true top-10 (measured
    0.70 on this fixture), and candidate-gen + exact rerank
    (pq_search, 50 candidates) recovers essentially all of it
    (measured 1.0) — the two-stage pattern real PQ serving uses."""
    from distributed_mapreduce__spark.operators.quantize import pq_search
    from distributed_mapreduce__spark.operators.similarity import (
        cosine_topk_blas,
    )

    cb = pq_train(clustered, m=8, k=256)
    queries = clustered.filter(F.col("vec_id") % 40 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_blas(clustered, queries, k=10).collect()
    }

    dec = pq_decode(pq_encode(clustered, cb), cb)
    raw = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_blas(dec, queries, k=10).collect()
    }
    raw_recall = len(raw & exact) / len(exact)
    assert raw_recall >= 0.6, f"PQ decode-search recall: {raw_recall}"

    reranked = {
        (r.query_id, r.neighbor_id)
        for r in pq_search(clustered, queries, cb, k=10, n_candidates=50).collect()
    }
    rr_recall = len(reranked & exact) / len(exact)
    assert rr_recall >= 0.95, f"PQ+rerank recall: {rr_recall}"


def test_pq_search_honors_vec_col(clustered):
    """A non-default vec_col must flow into BOTH stages — stage 1 used
    to look up a hard-coded 'embedding' on the queries side."""
    from distributed_mapreduce__spark.operators.quantize import pq_search

    cb = pq_train(clustered, m=4, k=16)
    queries = clustered.filter(F.col("vec_id") % 97 == 0)
    base = sorted(
        map(tuple, pq_search(clustered, queries, cb, k=5, n_candidates=20).collect())
    )
    ren = clustered.withColumnRenamed("embedding", "vec")
    qren = queries.withColumnRenamed("embedding", "vec")
    got = sorted(
        map(
            tuple,
            pq_search(ren, qren, cb, k=5, n_candidates=20, vec_col="vec").collect(),
        )
    )
    assert got == base


def test_train_is_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    a = sorted(map(tuple, pq_train(emb, m=4, k=8).collect()))
    b = sorted(map(tuple, pq_train(emb, m=4, k=8).collect()))
    assert a == b
