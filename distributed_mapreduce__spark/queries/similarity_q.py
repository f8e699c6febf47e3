"""Similarity-search queries over ``embeddings`` (SURVEY.md §2.2 E3).

Query set = vectors with vec_id % 50 == 0 (a deterministic sample).
Similarities are left-fold double dot products (see
operators/similarity.py) — bit-identical to the DuckDB list_reduce
oracle, so raw sims participate in the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    cosine_pairs_above,
    cosine_topk,
    hyperplanes,
    lsh_buckets,
)
from ..registry import register, register_local
from ..sources.tables import load_table

# --- shared oracle fragments ----------------------------------------------

_DOT = (
    "list_reduce(list_transform(generate_series(1, 64), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)

_NV = f"""
    nv AS (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS vnorm
      FROM embeddings
    )
"""

_SIM_QC = (
    _DOT.format(a="q.embedding", b="c.embedding") + " / (q.vnorm * c.vnorm)"
)


@register_local(
    "similarity_topk",
    oracle=f"""
    WITH {_NV},
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_SIM_QC} AS sim
      FROM nv q JOIN nv c ON c.vec_id <> q.vec_id
      WHERE q.vec_id % 50 = 0
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM sims
    ) WHERE rn <= 10
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 per query (broadcast queries;
    corpus scored shard-local, window moves k rows per partition)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk(queries, emb, k=10)


@register_local(
    "similarity_topk_lsh",
    oracle=f"""
    WITH {_NV},
    planes AS (
      SELECT p AS plane,
             list_transform(generate_series(0, 63), j ->
               (list_reduce(list_transform(generate_series(1, 8),
                  i -> CAST(strpos('0123456789abcdef',
                                   substring(md5('plane:' || p || ':' || j), i, 1)) - 1
                            AS BIGINT)),
                 (a, b) -> a * 16 + b) % 2001 - 1000) / 1000.0) AS r
      FROM unnest(generate_series(0, 7)) AS t(p)
    ),
    scored AS (
      SELECT vec_id, plane,
             CASE WHEN list_reduce(list_transform(generate_series(1, 64),
                        i -> CAST(embedding[i] AS DOUBLE) * r[i]), (x, y) -> x + y) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings CROSS JOIN planes
    ),
    buckets AS (
      SELECT vec_id, CAST(sum(bit * CAST(pow(2, plane) AS BIGINT)) AS BIGINT) AS bucket
      FROM scored GROUP BY vec_id
    ),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_SIM_QC} AS sim
      FROM nv q
      JOIN buckets bq ON bq.vec_id = q.vec_id
      JOIN buckets bc ON bc.bucket = bq.bucket
      JOIN nv c ON c.vec_id = bc.vec_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id % 50 = 0
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM sims
    ) WHERE rn <= 10
    """,
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10: random-hyperplane LSH (8 planes → 256 buckets)
    prunes candidates to the query's bucket before exact scoring — the
    scale path (≈N/256 scored per query instead of N). Pinned to 8
    planes for oracle parity at fixture scale; at larger N the plane
    count must grow like log2(N / bucket_size) — the sizing rule and
    its 10x measurement live on :func:`..operators.similarity.lsh_topk`.
    Local tier since round 6 (the multiprobe variant covers the LSH
    family for the driver; this slot went to
    :func:`similarity_topk_auto`)."""
    from ..operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return lsh_topk(emb, queries, n_planes=8, multiprobe=False, k=10)


@register(
    "similarity_topk_auto",
    oracle=f"""
    WITH {_NV},
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_SIM_QC} AS sim
      FROM nv q JOIN nv c ON c.vec_id <> q.vec_id
      WHERE q.vec_id % 50 = 0
    )
    SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM sims
    ) WHERE rn <= 10
    """,
)
def similarity_topk_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE similarity front door under the driver's value oracle
    (VERDICT r5 item 2): ``topk(strategy='auto')`` — at fixture scale
    the router picks the exact BLAS branch (Q collectible, Q·N within
    the matmul budget), which returns the same top-k PAIR SET and
    ranks as the fold oracle. The ``sim`` column is deliberately
    dropped from the registered output: BLAS normalizes-then-matmuls
    while the portable oracle left-folds, so raw sims can differ in
    the last float bit (ranks cannot, short of a sub-ULP tie); the
    fold-scored sims are value-hashed by ``similarity_topk``, and the
    blas-vs-fold pair-set equality is pinned by
    tests/test_similarity_quality.py. Counts come from a profile
    sidecar when $SPARK_GRAFT_PROFILE_DIR provides one (query count =
    ceil(n/50): fixture vec_ids are 0..n-1), else two count jobs."""
    from ..operators.profile import table_hints
    from ..operators.similarity import topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    hints = table_hints(spark, "embeddings")
    n = hints["n_rows"] if hints else None
    return topk(
        emb,
        queries,
        k=10,
        strategy="auto",
        corpus_count=n,
        query_count=(n + 49) // 50 if n is not None else None,
    ).select("query_id", "neighbor_id", "rank")


_PROBE_MASKS = [0] + [1 << b for b in range(8)]  # self + each 1-bit flip


@register(
    "similarity_topk_lsh_multiprobe",
    oracle=f"""
    WITH {_NV},
    planes AS (
      SELECT p AS plane,
             list_transform(generate_series(0, 63), j ->
               (list_reduce(list_transform(generate_series(1, 8),
                  i -> CAST(strpos('0123456789abcdef',
                                   substring(md5('plane:' || p || ':' || j), i, 1)) - 1
                            AS BIGINT)),
                 (a, b) -> a * 16 + b) % 2001 - 1000) / 1000.0) AS r
      FROM unnest(generate_series(0, 7)) AS t(p)
    ),
    scored AS (
      SELECT vec_id, plane,
             CASE WHEN list_reduce(list_transform(generate_series(1, 64),
                        i -> CAST(embedding[i] AS DOUBLE) * r[i]), (x, y) -> x + y) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings CROSS JOIN planes
    ),
    buckets AS (
      SELECT vec_id, CAST(sum(bit * CAST(pow(2, plane) AS BIGINT)) AS BIGINT) AS bucket
      FROM scored GROUP BY vec_id
    ),
    probes AS (
      SELECT b.vec_id, xor(b.bucket, m.mask) AS probe_bucket
      FROM buckets b CROSS JOIN (
        SELECT unnest([{", ".join(str(m) for m in _PROBE_MASKS)}]) AS mask) m
      WHERE b.vec_id % 50 = 0
    ),
    sims AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_SIM_QC} AS sim
      FROM nv q
      JOIN probes p ON p.vec_id = q.vec_id
      JOIN buckets bc ON bc.bucket = p.probe_bucket
      JOIN nv c ON c.vec_id = bc.vec_id AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rn
      FROM sims
    ) WHERE rn <= 10
    """,
)
def similarity_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH: each query also probes the 8 buckets one
    bit-flip away (9 probes → ~9·N/256 candidates) — the standard
    recall/cost dial between single-probe LSH and brute force. Probes
    expand via explode + equi-join on bucket (never a popcount-distance
    non-equi join, which would plan as a quadratic loop join).

    SCALE WARNING — do NOT copy the ``n_planes=8`` pin into production
    code. 8 planes is an ORACLE-PARITY constant (the DuckDB replay above
    hard-codes the same 8 hyperplanes); at fixed plane count bucket
    occupancy grows with N and candidate work goes quadratic — measured
    62x degradation at a 10x corpus step (SCALE.md appendix). The
    scaling default lives in :func:`..operators.similarity.lsh_topk`
    (``n_planes=None`` → log2(N / bucket_size) via ``resolve_n_planes``)
    and the engine-picks-for-you route is
    :func:`..operators.similarity.topk` with ``strategy='auto'``."""
    from ..operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return lsh_topk(emb, queries, n_planes=8, multiprobe=True, k=10)


@register_local(
    "embedding_neardup",
    oracle=f"""
    WITH {_NV},
    sims AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_DOT.format(a='a.embedding', b='b.embedding')} / (a.vnorm * b.vnorm) AS sim
      FROM nv a JOIN nv b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, sim FROM sims WHERE sim >= 0.45
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: the vector-space member of
    the dedup family (north-star E2 list). Threshold calibrated to 0.45
    because the synthetic embeddings contain no true near-dups (max
    pairwise sim ≈ 0.6) — at 0.95 the check would be vacuously empty;
    production near-dup uses 0.9+."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_above(emb, 0.45)


def augment_with_neardups(emb: DataFrame) -> DataFrame:
    """Corpus + planted near-duplicates: every 25th vector gets a copy
    with each component scaled by 1 + ((i % 7) - 3)/1000 (±0.3%,
    cosine ≈ 0.99999), under vec_id + 1000000.

    The perturbation is plain double arithmetic on the index, so the
    DuckDB oracle replays it bit-identically — giving the near-dup
    fixture a ground-truth pair set the raw synthetic embeddings lack
    (their max pairwise sim is ~0.6)."""
    base = emb.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> cast(x as double)"
            " * (1.0 + (cast(i % 7 as double) - 3.0) / 1000.0))"
        ).alias("embedding"),
    )
    return base.unionByName(planted)


_AUG = """
    aug AS (
      SELECT vec_id,
             list_transform(generate_series(1, 64),
                            i -> CAST(embedding[i] AS DOUBLE)) AS embedding
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(generate_series(1, 64),
               i -> CAST(embedding[i] AS DOUBLE)
                    * (1.0 + (CAST((i - 1) % 7 AS DOUBLE) - 3.0) / 1000.0))
      FROM embeddings WHERE vec_id % 25 = 0
    )
"""


@register(
    "embedding_neardup_lsh",
    oracle=f"""
    WITH {_AUG},
    nv AS (
      SELECT vec_id, embedding,
             sqrt({_DOT.format(a='embedding', b='embedding')}) AS vnorm
      FROM aug
    ),
    planes AS (
      SELECT p AS plane,
             list_transform(generate_series(0, 63), j ->
               (list_reduce(list_transform(generate_series(1, 8),
                  i -> CAST(strpos('0123456789abcdef',
                                   substring(md5('plane:' || p || ':' || j), i, 1)) - 1
                            AS BIGINT)),
                 (a, b) -> a * 16 + b) % 2001 - 1000) / 1000.0) AS r
      FROM unnest(generate_series(0, 63)) AS t(p)
    ),
    scored AS (
      SELECT vec_id, plane // 8 AS band, plane % 8 AS slot,
             CASE WHEN list_reduce(list_transform(generate_series(1, 64),
                        i -> embedding[i] * r[i]), (x, y) -> x + y) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM aug CROSS JOIN planes
    ),
    buckets AS (
      SELECT vec_id, band,
             CAST(sum(bit * CAST(pow(2, slot) AS BIGINT)) AS BIGINT) AS bucket
      FROM scored GROUP BY vec_id, band
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a
      JOIN buckets b ON b.band = a.band AND b.bucket = a.bucket
                     AND a.vec_id < b.vec_id
    ),
    sims AS (
      SELECT id_a, id_b,
             {_DOT.format(a='a.embedding', b='b.embedding')} / (a.vnorm * b.vnorm) AS sim
      FROM cands
      JOIN nv a ON a.vec_id = id_a
      JOIN nv b ON b.vec_id = id_b
    )
    SELECT id_a, id_b, sim FROM sims WHERE sim >= 0.9
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup, run against a corpus with
    planted perturbed copies (see ``augment_with_neardups``): banded
    hyperplane LSH (8 bands × 8 planes) buckets the vectors, only
    same-(band, bucket) pairs are scored, and candidates are verified
    at cosine ≥ 0.9 — the vector-space mirror of MinHash-LSH banding.

    A single 8-plane signature ANDs all 8 sign bits (collision prob
    p^8 → near-zero recall below sim ≈ 0.99); ORing 8 independent bands
    recovers ~certain recall on the planted near-dups while still
    pruning the N²/2 scoring to per-bucket blocks.
    tests/test_similarity_quality.py pins recall ≥ 0.8 against the
    exact O(N²) baseline on the same corpus."""
    from ..operators.similarity import banded_lsh_buckets, dot_fold, with_norm

    corpus = augment_with_neardups(load_table(spark, sf_dir, "embeddings"))
    buckets = banded_lsh_buckets(
        corpus, hyperplanes(spark, n_planes=64, dim=64), planes_per_band=8
    )
    cands = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()  # a pair can collide in several bands — score once
    )
    nv = with_norm(corpus)
    a = nv.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("vnorm").alias("na"),
    )
    b = nv.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("vnorm").alias("nb_"),
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (dot_fold("va", "vb") / (F.col("na") * F.col("nb_"))).alias("sim"),
        )
        .filter(F.col("sim") >= 0.9)
    )


def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN over the fixture embeddings: k-means coarse
    quantizer (16 cells), exact cosine within each query's nprobe=4
    closest cells — probing 1/4 of the corpus
    (:func:`..operators.similarity.ivf_topk`). Recall on these RANDOM
    unit vectors is ~0.8 at nprobe=4 (IVF's worst case — k-means finds
    little structure); the measured nprobe∈{1,2,4,8} recall curve on a
    CLUSTERED fixture, where real embeddings live, is pinned by
    tests/test_similarity_quality.py::test_ivf_recall_curve_on_clustered_vectors
    (≥0.9 recall probing <1/2 of the corpus).

    Not driver-registered (the k-means fit isn't SQL-portable, so a
    registry row could only ever be rows-only); recall and sim-parity
    gates live in tests/test_similarity_quality.py."""
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_topk(emb, queries, n_cells=16, nprobe=4, k=10)


def similarity_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-10 via the Arrow/numpy fast path.

    The query set reaches executors as a broadcast DataFrame join (no
    driver-side ``.collect()`` of vectors — the Spark broadcast exchange
    ships it once per executor), and each Arrow batch of (corpus, query)
    pairs is scored in one vectorized einsum instead of per-element
    column algebra.

    Not driver-registered: numpy accumulates in a different order than
    the portable left-fold, so last-bit sims can differ from the oracle
    (ranks agree; values can't hash-match). The pair-set equality gate
    vs the exact baseline lives in tests/test_similarity_quality.py."""
    import numpy as np
    import pandas as pd

    from ..operators.relational import top_k_per_group

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    pairs = (
        emb.select("vec_id", "embedding")
        .join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
    )

    def score(batches):
        for pdf in batches:
            c_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            q_mat = np.array(pdf["q_vec"].tolist(), dtype=np.float64)
            dots = np.einsum("ij,ij->i", q_mat, c_mat)
            norms = np.linalg.norm(c_mat, axis=1) * np.linalg.norm(q_mat, axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["vec_id"].to_numpy(),
                    "sim": dots / norms,
                }
            )

    scored = pairs.mapInPandas(
        score, schema="query_id long, neighbor_id long, sim double"
    )
    return top_k_per_group(
        scored, ["query_id"], [F.desc("sim"), F.asc("neighbor_id")], k=10, rn_col="rank"
    ).select("query_id", "neighbor_id", "sim", F.col("rank").cast("int").alias("rank"))
