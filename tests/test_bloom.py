"""Bloom-filter membership (operators/bloom.py): textbook sizing,
no-false-negative property, measured fpp, sql/arrow probe parity,
DuckDB replay of the bit arithmetic, map-only probe plan, and exact
equality of the Bloom-pruned decontamination scan with the plain one."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.bloom import (
    SQL_MAX_WORDS,
    BloomFilter,
    bloom_build,
    bloom_parameters,
    bloom_probe,
    decontaminate_bloom,
)
from distributed_mapreduce__spark.operators.dedup import ngram_contamination
from distributed_mapreduce__spark.sources.tables import load_table

from .oracle_utils import duck_connect

SF = "/root/testdata/sf0.01"


def test_parameters_textbook():
    # n=1000, p=0.01 → m = ⌈9585.06⌉ → 9586 → 9600 (word-aligned), k=7
    m, k = bloom_parameters(1000, 0.01)
    assert m == 9600 and k == 7
    # k tracks (m/n)·ln2; m is within one word of the exact formula
    for n, p in [(10, 0.5), (1_000_000, 0.001)]:
        m, k = bloom_parameters(n, p)
        exact = -n * math.log(p) / math.log(2) ** 2
        assert exact <= m < exact + 64
        assert k == max(1, round(m / n * math.log(2)))
    with pytest.raises(ValueError):
        bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


def test_build_no_false_negatives_and_fpp(spark):
    members = [f"member-{i}" for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in members], "v string").repartition(7)
    m, k = bloom_parameters(len(members), 0.01)
    bf = bloom_build(df, "v", m, k)
    # No false negatives — ever, by construction (and partition count
    # must not matter: partial bitsets OR associatively).
    assert all(bf.contains(v) for v in members)
    # Measured fpp on disjoint values stays near the target.
    strangers = [f"stranger-{i}" for i in range(4000)]
    fp = sum(bf.contains(v) for v in strangers) / len(strangers)
    assert fp <= 0.03, fp


def test_probe_methods_agree_and_null_contract(spark):
    members = [f"doc {i} text" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in members], "v string")
    m, k = bloom_parameters(len(members), 0.01)
    bf = bloom_build(df, "v", m, k)

    probe_vals = members[:100] + [f"absent {i}" for i in range(400)] + [None]
    pdf = spark.createDataFrame([(v,) for v in probe_vals], "v string")
    got_sql = {
        r["v"]: r["maybe_member"]
        for r in bloom_probe(pdf, "v", bf, method="sql").collect()
    }
    got_arrow = {
        r["v"]: r["maybe_member"]
        for r in bloom_probe(pdf, "v", bf, method="arrow").collect()
    }
    assert got_sql == got_arrow
    assert got_sql[None] is None
    assert all(got_sql[v] for v in members[:100])  # no false negatives
    # driver-side contains() agrees with both engines
    assert all(
        got_sql[v] == bf.contains(v) for v in probe_vals if v is not None
    )


def test_sql_probe_matches_duckdb_replay(spark):
    """The full bit chain — md5 60-bit fold mod m, word index, bit
    test — replayed in DuckDB against the same inlined words."""
    members = [f"w{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in members], "v string")
    m, k = bloom_parameters(len(members), 0.05)
    bf = bloom_build(df, "v", m, k)

    probe_vals = members[:50] + [f"x{i}" for i in range(250)]
    pdf = spark.createDataFrame([(v,) for v in probe_vals], "v string")
    got = {
        r["v"]: r["maybe_member"]
        for r in bloom_probe(pdf, "v", bf, method="sql").collect()
    }

    words_lit = "[" + ",".join(str(int(w)) for w in bf.words.view("<i8")) + "]"
    pos = (
        "(list_reduce(list_transform(generate_series(1, 15), "
        "i -> CAST(strpos('0123456789abcdef', "
        "substring(md5('{i}:' || v), i, 1)) - 1 AS BIGINT)), "
        f"(a, b) -> a * 16 + b) % {m})"
    )
    tests = " AND ".join(
        f"((({words_lit})[CAST({pos.format(i=i)} // 64 AS INT) + 1] "
        f">> CAST({pos.format(i=i)} % 64 AS INT)) & 1) = 1"
        for i in range(k)
    )
    con = duck_connect(SF)
    vals = ", ".join(f"('{v}')" for v in probe_vals)
    want = dict(
        con.execute(
            f"SELECT v, {tests} AS hit FROM (VALUES {vals}) t(v)"
        ).fetchall()
    )
    con.close()
    assert got == want


def test_probe_plan_is_map_only(spark):
    """The probed side must never join/shuffle/aggregate — the probe is
    the one full-corpus pass, and it has to stay a pure map."""
    df = spark.createDataFrame([(f"v{i}",) for i in range(50)], "v string")
    m, k = bloom_parameters(50, 0.01)
    bf = bloom_build(df, "v", m, k)
    for method in ("sql", "arrow"):
        plan = (
            bloom_probe(df, "v", bf, method=method)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, (method, plan)
        assert "Join" not in plan, (method, plan)
        assert "Aggregate" not in plan, (method, plan)


def test_sql_guard_and_auto_routing(spark):
    df = spark.createDataFrame([("a",)], "v string")
    import numpy as np

    big = BloomFilter(
        m=(SQL_MAX_WORDS + 1) * 64, k=2, words=np.zeros(SQL_MAX_WORDS + 1, dtype="uint64")
    )
    with pytest.raises(ValueError, match="SQL_MAX_WORDS"):
        bloom_probe(df, "v", big, method="sql")
    # auto routes the oversized filter to arrow instead of raising
    assert bloom_probe(df, "v", big, method="auto").collect()[0][
        "maybe_member"
    ] is False
    with pytest.raises(ValueError, match="unknown method"):
        bloom_probe(df, "v", big, method="nope")


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_decontaminate_bloom_equals_exact_scan(spark):
    """The front-door contract: Bloom only prunes — output is
    bit-identical to ngram_contamination on the real corpus."""
    docs = load_table(spark, SF, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 100 == 0)
    want = {
        (r.train_doc, r.eval_doc, r.n_shared)
        for r in ngram_contamination(docs, eval_docs, n=3).collect()
    }
    for method in ("sql", "arrow"):
        got = {
            (r.train_doc, r.eval_doc, r.n_shared)
            for r in decontaminate_bloom(
                docs, eval_docs, n=3, method=method
            ).collect()
        }
        assert got == want, method
    # the hint path skips the sizing count but not correctness
    got_hint = {
        (r.train_doc, r.eval_doc, r.n_shared)
        for r in decontaminate_bloom(
            docs, eval_docs, n=3, n_items_hint=5000
        ).collect()
    }
    assert got_hint == want


def test_bytes_round_trip(spark):
    bfi = bloom_build(
        spark.createDataFrame([(f"v{i}",) for i in range(100)], "v string"),
        "v",
        *bloom_parameters(100, 0.01),
    )
    back = BloomFilter.from_bytes(bfi.m, bfi.k, bfi.to_bytes())
    assert (back.words == bfi.words).all()
    assert back.contains("v3") and back.m == bfi.m and back.k == bfi.k
