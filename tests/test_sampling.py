"""Deterministic sampling: DuckDB-oracle value parity + the stability
properties that motivate content-addressed sampling (membership must
not depend on partitioning or on other rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    hash_uniform,
    stratified_quota,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

# DuckDB mirror of functions/hashing.md5_long: 60-bit hex-digit fold of
# md5('<seed>:' || key) — no conv() in DuckDB (see oracle playbook).
_MD5_LONG = """
  list_reduce(list_transform(generate_series(1, 15),
      i -> CAST(strpos('0123456789abcdef',
                substring(md5('{seed}:' || {key}), i, 1)) - 1 AS BIGINT)),
    (a, b) -> a * 16 + b)
"""
_UNIFORM = f"CAST(({_MD5_LONG}) % 1048576 AS DOUBLE) / 1048576.0"


def test_deterministic_sample_matches_oracle(spark, sf_dir):
    docs = load_table(spark, SF, "documents")
    got = deterministic_sample(docs, F.col("doc_id").cast("string"), 0.25).select(
        "doc_id"
    )
    u = _UNIFORM.format(seed=0, key="CAST(doc_id AS VARCHAR)")
    compare_query(
        spark, SF, got, f"SELECT doc_id FROM documents WHERE {u} < 0.25"
    )


def test_hash_split_matches_oracle_and_covers(spark):
    docs = load_table(spark, SF, "documents")
    got = hash_split(
        docs,
        F.col("doc_id").cast("string"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).select("doc_id", "split")
    u = _UNIFORM.format(seed=0, key="CAST(doc_id AS VARCHAR)")
    compare_query(
        spark,
        SF,
        got,
        f"""
        SELECT doc_id,
               CASE WHEN {u} < 0.8 THEN 'train'
                    WHEN {u} < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
        """,
    )
    # Rough proportions (hash uniformity) + total coverage.
    counts = {r["split"]: r["n"] for r in got.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert 0.7 < counts["train"] / total < 0.9


def test_split_membership_is_stable_under_corpus_growth(spark):
    """A row's split must depend only on its own key: the split column
    computed on half the corpus equals the one computed on all of it."""
    docs = load_table(spark, SF, "documents")
    frac = {"train": 0.8, "test": 0.2}
    key = F.col("doc_id").cast("string")
    full = {
        r.doc_id: r.split for r in hash_split(docs, key, frac).collect()
    }
    half = {
        r.doc_id: r.split
        for r in hash_split(docs.filter(F.col("doc_id") % 2 == 0), key, frac).collect()
    }
    assert half and all(full[k] == v for k, v in half.items())


def test_sample_is_partition_independent(spark):
    docs = load_table(spark, SF, "documents")
    key = F.col("doc_id").cast("string")
    a = {r.doc_id for r in deterministic_sample(docs, key, 0.3).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), key, 0.3).collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_stratified_quota_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = stratified_quota(
        docs, ["lang"], F.col("doc_id").cast("string"), n_per_group=20
    ).select("lang", "doc_id")
    h = _MD5_LONG.format(seed=0, key="CAST(doc_id AS VARCHAR)")
    compare_query(
        spark,
        SF,
        got,
        f"""
        SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY {h}) AS rn
          FROM documents
        ) WHERE rn <= 20
        """,
    )
    per_group = got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= 20 for r in per_group)


def test_leakage_safe_split_keeps_neardups_together(spark):
    """Near-dup clusters are split as units: every planted chain lands
    wholly in one split, singletons keep hash_split's per-doc
    assignment, and fractions still roughly hold."""
    from distributed_mapreduce__spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    # twin pairs (2k, 2k+1) for k<100, plus cross-range twins (500+k, 700+k)
    pairs = spark.createDataFrame(
        [(2 * k, 2 * k + 1) for k in range(100)]
        + [(500 + k, 700 + k) for k in range(50)],  # cross-range twins
        "doc_a long, doc_b long",
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    split_of = {r.doc_id: r.split for r in out.collect()}
    assert len(split_of) == 1000  # no rows lost or duplicated
    for a, b in [(2 * k, 2 * k + 1) for k in range(100)] + [
        (500 + k, 700 + k) for k in range(50)
    ]:
        assert split_of[a] == split_of[b], (a, b)
    # fractions approximately hold
    from collections import Counter

    c = Counter(split_of.values())
    assert 700 < c["train"] < 900
    # singletons (never in any pair) match plain per-doc hash_split
    paired = {x for k in range(100) for x in (2 * k, 2 * k + 1)} | {
        500 + k for k in range(50)
    } | {700 + k for k in range(50)}
    plain = {
        r.doc_id: r.split
        for r in hash_split(
            docs, F.col("doc_id").cast("string"), {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    for d in set(split_of) - paired:
        assert split_of[d] == plain[d]


def test_cluster_sample_planted_modes_and_determinism(spark):
    """Three well-separated planted modes with sizes 50/30/5: the
    per-cluster quota must keep ALL of the rare mode while capping the
    dominant ones — the balancing property uniform sampling lacks —
    and the subset must be bit-identical run-to-run."""
    import random

    from distributed_mapreduce__spark.operators.sampling import cluster_sample

    rng = random.Random(7)
    centers = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)]
    sizes = [50, 30, 5]
    rows, vid = [], 0
    for (cx, cy), n in zip(centers, sizes):
        for _ in range(n):
            rows.append(
                (vid, [cx + rng.gauss(0, 0.5), cy + rng.gauss(0, 0.5)])
            )
            vid += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = cluster_sample(vecs, n_per_cluster=10, k=3, kmeans_seed=11)
    got = out.select("vec_id", "cell").collect()

    # Quota: ≤10 per cell; the tiny mode (ids 80..84) survives whole.
    from collections import Counter

    per_cell = Counter(r["cell"] for r in got)
    assert all(c <= 10 for c in per_cell.values()), per_cell
    kept = {r["vec_id"] for r in got}
    assert set(range(80, 85)) <= kept
    assert sorted(per_cell.values()) == [5, 10, 10]
    # Output keeps the input columns + the cell tag.
    assert set(out.columns) == {"vec_id", "embedding", "cell"}

    again = {
        (r["vec_id"], r["cell"])
        for r in cluster_sample(vecs, n_per_cluster=10, k=3, kmeans_seed=11)
        .select("vec_id", "cell")
        .collect()
    }
    assert again == {(r["vec_id"], r["cell"]) for r in got}


def test_cluster_sample_fixture_quota_bounds(spark, sf_dir):
    """On the real embeddings fixture: exact quota per cell (min(n,
    |cell|) rows), no duplicated ids, renamed key column honored."""
    from collections import Counter

    from distributed_mapreduce__spark.operators.sampling import cluster_sample

    vecs = load_table(spark, sf_dir, "embeddings").withColumnRenamed(
        "vec_id", "doc_id"
    )
    out = cluster_sample(vecs, n_per_cluster=7, k=8, key_col="doc_id")
    got = out.select("doc_id", "cell").collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == len(set(ids))
    per_cell = Counter(r["cell"] for r in got)
    assert all(c <= 7 for c in per_cell.values())
    # cells with ≥7 members must deliver exactly 7 — recompute sizes
    # from the full assignment by rejoining on the same seeded model
    from distributed_mapreduce__spark.operators.similarity import ivf_assignments

    assign, _ = ivf_assignments(
        load_table(spark, sf_dir, "embeddings"), k=8, seed=42
    )
    full = Counter(r["cell"] for r in assign.collect())
    for cell, n in full.items():
        assert per_cell.get(cell, 0) == min(7, n), (cell, n, per_cell)


_ES_UNIFORM = """
  (CAST((list_reduce(list_transform(generate_series(1, 15),
      i -> CAST(strpos('0123456789abcdef',
                substring(md5('0:' || CAST({key} AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
    (a, b) -> a * 16 + b)) % 1048576 + 1 AS DOUBLE) / 1048576.0)
"""


def test_weighted_sample_matches_duckdb_replay(spark, sf_dir):
    """Ungrouped and grouped selections replayed exactly in DuckDB:
    same md5-derived uniform, same -ln(u)/w rank, same top-n."""
    from distributed_mapreduce__spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    u = _ES_UNIFORM.format(key="doc_id")

    flat = weighted_sample(docs, F.col("doc_id"), "n_chars", 40).select(
        "doc_id", "n_chars"
    )
    compare_query(
        spark,
        sf_dir,
        flat,
        f"""
        SELECT doc_id, n_chars FROM documents
        WHERE n_chars > 0
        ORDER BY -ln({u}) / n_chars LIMIT 40
        """,
    )

    grouped = weighted_sample(
        docs, F.col("doc_id"), "n_chars", 5, group_cols=["lang"]
    ).select("doc_id", "lang", "n_chars")
    compare_query(
        spark,
        sf_dir,
        grouped,
        f"""
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars, row_number() OVER (
            PARTITION BY lang ORDER BY -ln({u}) / n_chars) AS rn
          FROM documents WHERE n_chars > 0)
        WHERE rn <= 5
        """,
    )


def test_weighted_sample_proportionality_and_edges(spark):
    """One weight-10 row among nine weight-1 rows, replicated over 400
    independent groups, sampled n=1 per group: the heavy row must win
    ≈ 10/19 of groups (deterministic outcome, generous band). NULL and
    non-positive weights are never selected; n ≥ group size returns
    every eligible row."""
    from distributed_mapreduce__spark.operators.sampling import weighted_sample

    rows = []
    for g in range(400):
        for i in range(10):
            rows.append((g, f"{g}:{i}", 10.0 if i == 0 else 1.0))
    df = spark.createDataFrame(rows, "g int, k string, w double")
    picked = weighted_sample(df, F.col("k"), "w", 1, group_cols=["g"]).collect()
    assert len(picked) == 400
    heavy_wins = sum(1 for r in picked if r["k"].endswith(":0"))
    # E[X] = 400 * 10/19 ≈ 211, σ ≈ 10 — band is ±5σ.
    assert 160 <= heavy_wins <= 260, heavy_wins

    edge = spark.createDataFrame(
        [("a", 1.0), ("b", None), ("c", 0.0), ("d", -2.0), ("e", 3.0)],
        "k string, w double",
    )
    got = {r["k"] for r in weighted_sample(edge, F.col("k"), "w", 10).collect()}
    assert got == {"a", "e"}


def test_deterministic_shuffle_matches_oracle_and_is_stable(spark, sf_dir):
    """The shuffled order replays exactly in DuckDB (same md5-uniform
    sort key), is identical run-to-run and under repartitioning, and a
    different seed yields a genuinely different permutation."""
    from distributed_mapreduce__spark.operators.sampling import (
        deterministic_shuffle,
    )
    from tests.oracle_utils import duck_connect

    docs = load_table(spark, SF, "documents").select("doc_id")
    got = [r.doc_id for r in deterministic_shuffle(docs, F.col("doc_id").cast("string")).collect()]

    u = _UNIFORM.format(seed=0, key="CAST(doc_id AS VARCHAR)")
    con = duck_connect(SF)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents ORDER BY {u} ASC, CAST(doc_id AS VARCHAR) ASC"
        ).fetchall()
    ]
    con.close()
    assert got == want
    # stable under physical layout
    again = [
        r.doc_id
        for r in deterministic_shuffle(
            docs.repartition(13), F.col("doc_id").cast("string")
        ).collect()
    ]
    assert again == got
    # a new seed is a new permutation of the same rows
    other = [
        r.doc_id
        for r in deterministic_shuffle(
            docs, F.col("doc_id").cast("string"), seed=1
        ).collect()
    ]
    assert other != got and sorted(other) == sorted(got)


def test_with_contiguous_ids(spark, sf_dir):
    """Distributed zipWithIndex: ids are exactly 0..N-1 in the given
    order (DuckDB row_number replay), never funneled through one
    partition, and stable when re-run."""
    from distributed_mapreduce__spark.operators.relational import (
        with_contiguous_ids,
    )
    from tests.oracle_utils import duck_connect

    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    got = {
        r.doc_id: r.row_id
        for r in with_contiguous_ids(docs, ["lang", "doc_id"]).collect()
    }
    con = duck_connect(SF)
    want = dict(
        con.execute(
            "SELECT doc_id, row_number() OVER (ORDER BY lang, doc_id) - 1 "
            "FROM documents"
        ).fetchall()
    )
    con.close()
    assert got == want
    # re-run is identical (unique tie-breaker makes the order total)
    again = {
        r.doc_id: r.row_id
        for r in with_contiguous_ids(docs, ["lang", "doc_id"]).collect()
    }
    assert again == got
    # multiple real partitions carried ids (no single-partition funnel)
    from pyspark.sql import functions as F2

    n_parts = (
        with_contiguous_ids(docs.repartition(8), ["lang", "doc_id"])
        .select(F2.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert n_parts > 1
