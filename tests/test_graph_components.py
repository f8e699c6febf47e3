"""Connected components: DuckDB recursive-CTE oracle over the REAL
MinHash-LSH pair output, synthetic chain/clique shapes, and the
pairs→clusters→survivors integration."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.graph import (
    connected_components,
    dedup_survivors,
)
from distributed_mapreduce__spark.sources.tables import load_table

#: slow tier (round 16): excluded from the driver-window default
#: run; the full suite (pytest -m "") runs and is logged every round.
pytestmark = __import__("pytest").mark.slow

SF = "/root/testdata/sf0.01"


def _components_oracle(edges):
    """min-reachable-id per node via DuckDB recursive CTE."""
    con = duckdb.connect()
    con.execute("CREATE TABLE e (s BIGINT, d BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    return dict(
        con.execute(
            """
            WITH RECURSIVE u AS (
              SELECT s, d FROM e UNION SELECT d, s FROM e
            ),
            walk(node, comp) AS (
              SELECT s, s FROM u
              UNION
              SELECT u.d, walk.comp FROM walk JOIN u ON u.s = walk.node
            )
            SELECT node, min(comp) FROM walk GROUP BY node
            """
        ).fetchall()
    )


@pytest.mark.parametrize("algorithm", ["star", "label"])
def test_chain_and_clique_shapes(spark, algorithm):
    # chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.comp
           for r in connected_components(pairs, algorithm=algorithm).collect()}
    assert got == _components_oracle(edges)
    assert got[5] == 1 and got[12] == 10 and got[21] == 20


def test_deep_chain_converges_with_star_contraction(spark):
    """A 200-node path has diameter 199: label propagation cannot reach
    a fixpoint in 25 rounds, but the default star contraction must
    converge in log²-many (VERDICT r3 item 5). Shuffled ids so the
    minimum sits mid-chain, not at an end."""
    import random

    rng = random.Random(7)
    ids = list(range(1, 201))
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")

    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {n: 1 for n in ids}  # one component, min id 1

    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(pairs, algorithm="label").collect()


def test_two_deep_chains_stay_separate(spark):
    """Star contraction must not merge disjoint deep components."""
    e1 = [(i, i + 1) for i in range(1, 80)]          # comp min 1
    e2 = [(i, i + 1) for i in range(1000, 1080)]     # comp min 1000
    pairs = spark.createDataFrame(e1 + e2, "doc_a long, doc_b long")
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert all(got[n] == 1 for n in range(1, 81))
    assert all(got[n] == 1000 for n in range(1000, 1081))


def test_components_of_real_lsh_pairs_match_oracle(spark):
    from distributed_mapreduce__spark.queries.dedup_q import (
        dedup_minhash_pairs,
    )

    pairs = dedup_minhash_pairs(spark, SF).select("doc_a", "doc_b")
    edges = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    assert edges
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == _components_oracle(edges)


def test_dedup_survivors_keeps_one_per_cluster(spark):
    docs = load_table(spark, SF, "documents")
    edges = [(1, 2), (2, 3), (7, 8)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    kept = {r.doc_id for r in dedup_survivors(docs, pairs).select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept == all_ids - {2, 3, 8}  # min of each cluster survives
