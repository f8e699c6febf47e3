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


def test_reconstruction_beats_mean_baseline(clustered):
    cb = pq_train(clustered, m=8, k=16)
    dec = pq_decode(pq_encode(clustered, cb), cb).withColumnRenamed(
        "embedding", "recon"
    )
    joined = clustered.join(dec, "vec_id")
    sq = F.aggregate(
        F.zip_with("embedding", "recon", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mse = joined.select(sq.alias("e")).agg(F.avg("e")).first()[0]
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
    assert mse < base_mse / 4, (mse, base_mse)


def test_decode_then_search_recall(clustered):
    """The memory-bound ANN serving pattern: store 4-byte codes,
    reconstruct on the fly, search the reconstruction. On clustered
    vectors the decoded corpus must recover most of the true top-10."""
    from distributed_mapreduce__spark.operators.similarity import (
        cosine_topk_blas,
    )

    cb = pq_train(clustered, m=8, k=16)
    dec = pq_decode(pq_encode(clustered, cb), cb)
    queries = clustered.filter(F.col("vec_id") % 40 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_blas(clustered, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_blas(dec, queries, k=10).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, f"PQ decode-search recall: {recall}"


def test_train_is_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    a = sorted(map(tuple, pq_train(emb, m=4, k=8).collect()))
    b = sorted(map(tuple, pq_train(emb, m=4, k=8).collect()))
    assert a == b
