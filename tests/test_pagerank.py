"""PageRank: numpy power-iteration oracle on seeded random digraphs,
closed-form shapes (cycle, star, dangling sink), and the registered-
domain aggregation wrapper."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.graph import (
    domain_link_ranks,
    pagerank,
)

#: slow tier (round 16): excluded from the driver-window default
#: run; the full suite (pytest -m "") runs and is logged every round.
pytestmark = __import__("pytest").mark.slow

D = 0.85
TOL = 1e-9


def _oracle(edges, damping=D, tol=TOL):
    """Dense numpy power iteration with identical semantics: distinct
    edges, uniform teleport, dangling mass spread uniformly."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    dedup = sorted(set(edges))
    for u, _ in dedup:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(200):
        contrib = np.zeros(n)
        for u, v in dedup:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dmass = r[out == 0].sum()
        nr = (1 - damping) / n + damping * (contrib + dmass / n)
        if np.abs(nr - r).sum() < tol:
            return dict(zip(nodes, nr))
        r = nr
    raise AssertionError("oracle did not converge")


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_seeded_random_digraph_matches_numpy(spark):
    rng = np.random.default_rng(7)
    edges = [
        (int(rng.integers(0, 30)), int(rng.integers(0, 30)))
        for _ in range(120)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges, tol=TOL, max_iter=200)
    want = _oracle(edges)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_cycle_is_uniform(spark):
    # On a directed cycle every node is symmetric: rank = 1/n exactly.
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _run(spark, edges)
    for v in got.values():
        assert v == pytest.approx(1.0 / 6, abs=1e-9)


def test_dangling_sink_absorbs_then_redistributes(spark):
    # star into a sink with no out-links: the sink must NOT swallow
    # all mass (dangling redistribution), and spokes stay symmetric.
    edges = [(1, 9), (2, 9), (3, 9)]
    got = _run(spark, edges, tol=TOL, max_iter=200)
    want = _oracle(edges)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-7)
    assert got[9] > got[1] == pytest.approx(got[2], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_parallel_edges_collapse(spark):
    # duplicate (1,2) edges must not double 2's inflow
    once = _run(spark, [(1, 2), (2, 1)])
    dup = _run(spark, [(1, 2), (1, 2), (2, 1)])
    for k in once:
        assert dup[k] == pytest.approx(once[k], abs=1e-12)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def test_max_iter_exhaustion_raises(spark):
    # asymmetric: uniform start is NOT the fixed point, so one round
    # cannot reach an impossible tolerance
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="pagerank"):
        pagerank(df, max_iter=1, tol=1e-15)


def test_domain_link_ranks_aggregates_hosts(spark):
    links = spark.createDataFrame(
        [
            # blog.alpha.com and www.alpha.com are ONE registered domain;
            # their cross-links are self-links and must be dropped.
            ("https://blog.alpha.com/a", "https://www.alpha.com/b"),
            ("https://blog.alpha.com/a", "https://beta.org/x"),
            ("https://beta.org/x", "https://alpha.com/"),
            ("https://gamma.net/p", "https://beta.org/y"),
        ],
        "src_url string, dst_url string",
    )
    got = {r.domain: r.rank for r in domain_link_ranks(links).collect()}
    want = _oracle_domains(
        [("alpha.com", "beta.org"), ("beta.org", "alpha.com"),
         ("gamma.net", "beta.org")]
    )
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def _oracle_domains(edges):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    int_edges = [(idx[u], idx[v]) for u, v in edges]
    ranks = _oracle(int_edges)
    return {nodes[i]: ranks[i] for i in ranks}
