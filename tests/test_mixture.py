"""Mixture resampling: the kept-row set must be bit-reproducible in
DuckDB (same hash, same float chain), proportions must land on the
target mixture, and unlisted groups must vanish."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.mixture import (
    mixture_rates,
    resample_to_mixture,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

_MD5_LONG = """
  list_reduce(list_transform(generate_series(1, 15),
      i -> CAST(strpos('0123456789abcdef',
                substring(md5('{seed}:' || {key}), i, 1)) - 1 AS BIGINT)),
    (a, b) -> a * 16 + b)
"""
_UNIFORM = f"CAST(({_MD5_LONG}) % 1048576 AS DOUBLE) / 1048576.0"

# lang zh (75 docs) deliberately unlisted → dropped.
WEIGHTS = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.1}


def test_mixture_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = resample_to_mixture(
        docs, "lang", WEIGHTS, F.col("doc_id").cast("string")
    ).select("doc_id", "lang")

    total = sum(WEIGHTS.values())
    vals = ", ".join(
        f"('{g}', CAST({w / total!r} AS DOUBLE))" for g, w in WEIGHTS.items()
    )
    u = _UNIFORM.format(seed=0, key="CAST(doc_id AS VARCHAR)")
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH w(lang, p) AS (VALUES {vals}),
        counts AS (
          SELECT lang, count(*) AS n FROM documents GROUP BY lang
        ),
        joined AS (SELECT c.lang, n, p FROM counts c JOIN w USING (lang)),
        t AS (SELECT min(n / p) AS t FROM joined),
        rates AS (
          SELECT lang, (p * t.t) / n AS rate FROM joined CROSS JOIN t
        )
        SELECT doc_id, d.lang AS lang
        FROM documents d JOIN rates USING (lang)
        WHERE {u} < rate
        """,
    )


def test_mixture_hits_target_proportions(spark):
    docs = load_table(spark, SF, "documents")
    # fixture counts: en 218, de 70, es 73, fr 64 → T = min(n/p) = 350.
    rates = {r.lang: r for r in mixture_rates(docs, "lang", WEIGHTS).collect()}
    assert rates["de"].rate == 1.0  # de is the binding group
    assert all(r.rate <= 1.0 for r in rates.values())

    out = resample_to_mixture(
        docs, "lang", WEIGHTS, F.col("doc_id").cast("string")
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "zh" not in counts  # unlisted group dropped
    assert counts["de"] == 70  # rate-1.0 group kept whole
    total = sum(counts.values())
    for g, w in WEIGHTS.items():
        expect = w / sum(WEIGHTS.values())
        assert abs(counts[g] / total - expect) < 0.08, (g, counts)


def test_mixture_is_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    key = F.col("doc_id").cast("string")
    a = sorted(
        r.doc_id
        for r in resample_to_mixture(docs, "lang", WEIGHTS, key)
        .select("doc_id")
        .collect()
    )
    b = sorted(
        r.doc_id
        for r in resample_to_mixture(
            docs.repartition(13), "lang", WEIGHTS, key
        )
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 100


def test_absent_weighted_group_raises(spark):
    """A weighted group with ZERO rows makes the target mixture
    unattainable — mixture_rates must raise, not silently renormalize
    over the present groups (ADVICE r3)."""
    import pytest

    docs = load_table(spark, SF, "documents")
    bad = dict(WEIGHTS, xx=0.1)
    with pytest.raises(ValueError, match="xx"):
        mixture_rates(docs, "lang", bad)
    with pytest.raises(ValueError, match="xx"):
        resample_to_mixture(docs, "lang", bad, F.col("doc_id").cast("string")).count()
    # validate=False keeps the old lazy behavior for known inventories
    assert mixture_rates(docs, "lang", bad, validate=False).count() == 4
