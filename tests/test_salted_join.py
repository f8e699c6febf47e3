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
