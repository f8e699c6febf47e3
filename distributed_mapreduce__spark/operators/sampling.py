"""Deterministic sampling / dataset splitting (LLM-pipeline surface).

Training-data pipelines need *reproducible* sampling: re-running the
pipeline (or re-executing a failed task — Spark retries tasks at will)
must select the same rows. ``df.sample()`` does not guarantee that
across retries/partitionings, so everything here derives from a
content hash of a key column (:mod:`..functions.hashing`, md5-based
and engine-portable, so every operator is DuckDB-oracle-checkable):

- ``hash_uniform``       — U[0,1) per row from md5(key), the primitive.
- ``deterministic_sample`` — Bernoulli(p) sample, stable under retries.
- ``hash_split``         — named train/val/test splits by cumulative
                           fractions; a row's split NEVER changes when
                           other rows come or go (unlike randomSplit).
- ``stratified_quota``   — exactly-n-per-group sample in hash order
                           (per-language / per-source quotas).
- ``leakage_safe_split`` — hash_split over near-dup clusters, so a
                           test doc's near-twin can't land in train.
- ``cluster_sample``     — per-embedding-cluster quota (diversity
                           selection; rare modes survive the budget).
- ``weighted_sample``    — without-replacement sampling ∝ a weight
                           column (Efraimidis–Spirakis order statistic).

Scale: all are one projection (+ for quotas, one shuffle on the group
key); no RNG state, no driver coordination, no sort of the full data.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: Denominator for the hash→uniform mapping. 2^20 buckets keeps the
#: integer arithmetic exact in both engines while giving ~1e-6 grain.
_GRAIN = 1 << 20


def hash_uniform(key: Column | str, seed: int = 0) -> Column:
    """U[0,1) from the key's md5 — deterministic, partition-independent,
    identical in Spark and DuckDB (integer mod then one exact division)."""
    return (md5_long(key, seed) % F.lit(_GRAIN)).cast("double") / F.lit(
        float(_GRAIN)
    )


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep rows with hash_uniform(key) < fraction. Content-addressed:
    the same row is kept in every run, retry, and partitioning."""
    return df.filter(hash_uniform(key, seed) < F.lit(fraction))


def hash_split(
    df: DataFrame,
    key: Column | str,
    fractions: Mapping[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Tag each row with a named split by cumulative hash ranges.

    ``fractions`` maps name → fraction (must sum to ~1; the last split
    absorbs rounding). Stable membership: a document's split depends
    only on its own key, so growing the corpus never reshuffles
    existing rows between train and test — the property randomSplit
    lacks and leakage audits need."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_uniform(key, seed)
    names = list(fractions)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        branch = F.when(u < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(cum), F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def stratified_quota(
    df: DataFrame,
    group_cols: Sequence[str],
    key: Column | str,
    n_per_group: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly min(n, |group|) rows per group, chosen in hash order.

    The hash rank is a deterministic total order (ties broken by the
    60-bit hash itself being unique per key in practice; collisions
    would only swap which of two rows is picked). One shuffle on the
    group key + per-partition sort — same shape as top-k per group,
    linear at 100 TB."""
    from .relational import top_k_per_group

    ranked = df.withColumn("_h", md5_long(key, seed))
    return (
        top_k_per_group(
            ranked, list(group_cols), [F.asc("_h")], k=n_per_group, rn_col="_rn"
        )
        .drop("_h", "_rn")
    )


def leakage_safe_split(
    df: DataFrame,
    near_dup_pairs: DataFrame,
    fractions: Mapping[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """:func:`hash_split` that cannot leak near-duplicates across
    splits: documents connected by ``near_dup_pairs`` (doc_a, doc_b)
    are assigned as a GROUP, keyed by their dedup cluster id.

    Per-document hash splitting silently places a test document's
    near-twin in train — the contamination class decontamination scans
    for after the fact; this prevents it by construction. Cluster ids
    come from :func:`..graph.connected_components` (star contraction,
    log²-round); isolated documents (no near-dup) key by their own id,
    preserving hash_split's stable-membership property: adding corpus
    never moves an existing SINGLETON between splits, and a cluster
    only moves if its min-id member changes (i.e. the cluster itself
    grew a new older twin — exactly when re-deciding is correct).

    One extra shuffle vs hash_split (the left join on cluster id);
    the pair list is near-dup-density-sized, never corpus².
    """
    from .graph import connected_components

    comp = connected_components(near_dup_pairs).select(
        F.col("node").alias(key_col), F.col("comp").alias("_lss_comp")
    )
    withc = df.join(comp, key_col, "left").withColumn(
        "_lss_key",
        F.coalesce(F.col("_lss_comp"), F.col(key_col)).cast("string"),
    )
    return (
        hash_split(withc, F.col("_lss_key"), fractions, seed=seed,
                   split_col=split_col)
        .drop("_lss_comp", "_lss_key")
    )


def cluster_sample(
    vectors: DataFrame,
    n_per_cluster: int,
    k: int = 16,
    kmeans_seed: int = 42,
    seed: int = 0,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-preserving subset selection: k-means cells over the
    embedding column, then an exact per-cell quota in deterministic
    hash order — input columns + a ``cell`` tag out.

    Uniform sampling keeps the corpus's mode collapse: 95% news → a
    95%-news sample. Cluster-quota sampling (the embedding-space
    balancing step of SemDeDup-lineage curation, Abbas et al. 2023)
    caps every embedding cluster at ``n_per_cluster``, so rare modes
    survive selection and dominant modes stop crowding the budget.

    Composition of existing scale pieces: the coarse quantizer is
    :func:`.similarity.ivf_assignments` (tiny broadcast centroid
    model, one embarrassingly-parallel assignment pass; fit on a
    sample at real scale), the quota is :func:`stratified_quota`
    (one shuffle keyed by cell + per-partition sort). Deterministic
    end-to-end: seeded centroids + content-addressed hash ranks, so
    the same corpus yields the same subset in every run and retry.
    KMeans is not SQL-portable, so tests gate structure (quota bounds,
    determinism, planted-mode recovery) rather than a DuckDB replay.
    """
    from .similarity import ivf_assignments

    vecs = vectors.withColumnRenamed(key_col, "vec_id") if key_col != "vec_id" else vectors
    assign, _ = ivf_assignments(vecs, k=k, seed=kmeans_seed, vec_col=vec_col)
    tagged = vecs.join(assign, "vec_id")
    out = stratified_quota(tagged, ["cell"], F.col("vec_id"), n_per_cluster, seed)
    return out.withColumnRenamed("vec_id", key_col) if key_col != "vec_id" else out


def weighted_sample(
    df: DataFrame,
    key: Column | str,
    weight_col: str,
    n: int,
    group_cols: Sequence[str] = (),
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the n rows
    (per group, if ``group_cols``) with the smallest exponential rank
    ``-ln(u)/w`` — Efraimidis & Spirakis 2006's A-Res order statistic,
    equivalent to drawing without replacement with inclusion pressure
    proportional to ``weight_col``.

    "Sample 1M documents ∝ quality score" is the curation step between
    hard filtering (loses borderline data) and uniform sampling
    (ignores quality entirely). Like every sampler here the randomness
    is content-addressed — u derives from md5(key) — so retries,
    re-partitioning, and re-runs select the same rows, and the DuckDB
    oracle can replay the selection exactly.

    Rows with NULL or non-positive weight are excluded (zero weight =
    never sampled). Scale: ungrouped top-n plans as
    TakeOrderedAndProject (per-partition partial top-n, no global
    sort); grouped is one shuffle on the group key — both linear.
    """
    u = (md5_long(key, seed) % F.lit(_GRAIN) + 1).cast("double") / F.lit(
        float(_GRAIN)
    )
    rank = -F.log(u) / F.col(weight_col)
    base = df.filter(F.col(weight_col) > 0).withColumn("_es_rank", rank)
    if group_cols:
        from .relational import top_k_per_group

        out = top_k_per_group(
            base, list(group_cols), [F.asc("_es_rank")], k=n, rn_col="_rn"
        ).drop("_rn")
    else:
        out = base.orderBy(F.asc("_es_rank")).limit(n)
    return out.drop("_es_rank")


def deterministic_shuffle(
    df: DataFrame, key: Column | str, seed: int = 0
) -> DataFrame:
    """Globally shuffle rows into a random — but seeded and
    reproducible — order: sort by ``hash_uniform(key, seed)``.

    Training pipelines shuffle the corpus before sharding so
    neighboring documents (same crawl, same domain) don't land in the
    same batch; doing it with a content-addressed sort key instead of
    ``rand()`` means retries, re-runs, and re-partitioning produce the
    IDENTICAL order (and a SQL oracle can replay it). A different
    ``seed`` is a fresh epoch-level permutation.

    Scale: one range shuffle (Spark samples the hash range, then
    range-partitions + sorts within partitions — the classic
    distributed total sort, no single-partition bottleneck). Feed the
    result straight to ``sinks.write_training_shards`` — parquet
    preserves within-file row order, and ``maxRecordsPerFile`` splits
    files without reordering. The hash tiebreaker is the key itself, so
    the order is total iff ``key`` is unique (use the doc id).
    """
    c = F.col(key) if isinstance(key, str) else key
    return df.orderBy(hash_uniform(c, seed).asc(), c.cast("string").asc())
