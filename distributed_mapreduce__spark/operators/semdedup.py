"""Semantic deduplication (SemDeDup-style embedding-space dedup).

MinHash catches *lexical* near-duplicates; embedding-space dedup
catches *semantic* ones — paraphrases, translations-of-boilerplate,
template rewrites — that share almost no n-grams. The published recipe
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540) is:

1. k-means-cluster the embeddings (a tiny broadcast model, fit on a
   sample at real scale — the same coarse quantizer IVF uses),
2. compare pairs ONLY within a cluster (the quadratic work drops from
   N² to Σ|cell|² ≈ N²/k, and each cell's self-join is an equi-join
   Spark shuffles by cell id),
3. treat pairs with cosine ≥ threshold as duplicates and keep one
   representative per connected group.

This module composes the engine's existing pieces: the IVF coarse
quantizer (:func:`.similarity.ivf_assignments`), fold-based cosine
(:func:`.similarity.dot_fold`), star-contraction connected components
and survivor selection (:mod:`.graph`).

Scale: the cell self-join is the only super-linear step and it is
bucketed by construction; skewed cells (one giant cluster) are the
known failure mode — raise k, or let AQE skew-join split the hot
cell. Like every clustering-based method, a duplicate pair split
across two cells is missed; the paper (and the test gate) accepts
the small recall loss in exchange for tractability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import dedup_survivors
from .similarity import dot_fold, ivf_assignments, with_norm


def semantic_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    k: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    project_dim: int | None = None,
    in_dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos): within-cluster pairs with cosine ≥ threshold,
    id_a < id_b.

    One k-means fit + assignment pass, one norm pass, one self-equi-join
    on the cell id — never an all-pairs join across cells.

    ``project_dim`` runs the CLUSTERING stage on a
    Johnson–Lindenstrauss reduction of the embeddings
    (:func:`.projection.project_vectors`): the k-means fit/assign pass
    — the step that touches every coordinate of every vector — costs
    ``project_dim``/``in_dim`` of the full-width work, while the final
    cosine is still computed on the ORIGINAL vectors, so a reported
    pair's ``cos`` is exact and precision is unchanged by construction;
    only which pairs land in the same cell (recall) depends on the
    projection, and JL bounds that distortion. This is the standard
    accelerator for web-scale SemDeDup runs. ``in_dim`` (the source
    width) is inferred from one row when omitted."""
    if project_dim is not None:
        from .projection import SQL_MAX_TERMS, project_vectors

        if in_dim is None:
            first = (
                vectors.select(vec_col)
                .filter(F.col(vec_col).isNotNull())
                .first()
            )
            if first is None:  # no vectors at all — nothing to project
                return semantic_dup_pairs(
                    vectors, threshold, k, seed, vec_col, project_dim=None
                )
            in_dim = len(first[0])
        method = "sql" if project_dim * in_dim <= SQL_MAX_TERMS else "arrow"
        reduced = project_vectors(
            vectors.select("vec_id", vec_col),
            in_dim,
            project_dim,
            seed=seed,
            vec_col=vec_col,
            out_col="_pvec",
            method=method,
        )
        assign, _ = ivf_assignments(reduced, k=k, seed=seed, vec_col="_pvec")
    else:
        assign, _ = ivf_assignments(vectors, k=k, seed=seed, vec_col=vec_col)
    v = with_norm(vectors, vec_col).join(assign, "vec_id")
    a = v.select(
        F.col("cell"),
        F.col("vec_id").alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("vnorm").alias("_na"),
    )
    b = v.select(
        F.col("cell"),
        F.col("vec_id").alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("vnorm").alias("_nb"),
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos", dot_fold("_va", "_vb") / (F.col("_na") * F.col("_nb"))
        )
        .filter(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", "cos")
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    k: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    project_dim: int | None = None,
    in_dim: int | None = None,
) -> DataFrame:
    """The corpus minus semantic near-duplicates: cluster the duplicate
    pair graph, keep the min-id member per group (deterministic under
    retries), pass unpaired vectors through untouched. ``project_dim``
    accelerates the clustering stage (see
    :func:`semantic_dup_pairs`)."""
    pairs = semantic_dup_pairs(
        vectors, threshold, k, seed, vec_col, project_dim, in_dim
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return dedup_survivors(vectors, pairs, id_col="vec_id")
