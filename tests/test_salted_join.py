"""Skew-salted join: result-equivalence with the plain join on a
genuinely skewed input, plus the dispersion property that is the whole
point (a hot key's rows actually land on many (key, salt) buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.functions.hashing import stable_bucket
from distributed_mapreduce__spark.operators.relational import salted_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _fixtures(spark):
    # 90% of fact rows share key 0 — the single-straggler regime.
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    fact, dim = _fixtures(spark)
    plain = fact.join(dim, "k").select("row_id", "k", "v", "label")
    salted = salted_join(fact, dim, on="k", salt_by="row_id").select(
        "row_id", "k", "v", "label"
    )
    assert _rows(salted) == _rows(plain)


def test_hot_key_rows_spread_over_salts(spark):
    fact, _ = _fixtures(spark)
    n_salts = 16
    buckets = (
        fact.filter(F.col("k") == 0)
        .select(stable_bucket(F.col("row_id").cast("string"), n_salts, seed=7).alias("s"))
        .distinct()
        .count()
    )
    # ~9000 hot rows over 16 hash buckets: all populated w.h.p.
    assert buckets == n_salts


def test_key_skew_report(spark):
    """Skew diagnosis: a planted hot key dominates the report with the
    right count/share/salt numbers; a uniform key reads 'ok'."""
    from distributed_mapreduce__spark.plans.partitioning import (
        key_skew_report,
    )

    n_hot, n_tail = 8000, 2000
    df = spark.range(n_hot + n_tail).selectExpr(
        "CASE WHEN id < 8000 THEN 'hot' ELSE CAST(id AS STRING) END AS k"
    )
    rep = key_skew_report(df, "k")
    assert rep["n_rows"] == n_hot + n_tail
    top = rep["hot_keys"][0]
    assert top["key"] == "hot" and top["cnt"] == n_hot
    assert abs(top["share"] - 0.8) < 1e-9
    import math

    assert top["salt_buckets"] == math.ceil(n_hot / rep["even_share"])
    assert rep["recommendation"] in ("salt", "broadcast-or-salt")

    uniform = spark.range(10_000).selectExpr("CAST(id AS STRING) AS k")
    rep_u = key_skew_report(uniform, "k")
    assert rep_u["recommendation"] == "ok"
    # full hints skip the profile scan entirely and change nothing
    rep_h = key_skew_report(
        df, "k", n_rows=n_hot + n_tail, n_distinct=n_tail + 1
    )
    assert rep_h["hot_keys"][0]["cnt"] == n_hot
